"""Raw asyncio OpenAI-compatible chat-completions client with SSE streaming.

Speaks the same wire protocol as the reference (reference: the Python side
uses the openai SDK, interpolation_engine.py:649-653, :749-777; the Rust side
POSTs ``{api}/v1/chat/completions`` and parses the SSE stream itself,
rust-project/src/chat.rs:29-183). Like the Rust implementation we:

* normalize the API url and POST ``/v1/chat/completions``;
* merge ``extra_body`` into the request **top-level** (llama.cpp grammar
  support);
* stream ``data:`` SSE lines, yielding content deltas and finish reasons.

No third-party HTTP library: plain ``asyncio.open_connection`` (TLS via
ssl for https), HTTP/1.1 with chunked-transfer decoding.
"""

from __future__ import annotations

import asyncio
import json
import ssl
from typing import AsyncIterator, Optional
from urllib.parse import urlparse


class ChatError(Exception):
    pass


class OutOfContextError(ChatError):
    """Generation stopped because the model ran out of context length."""


def normalize_api_url(api_url: str) -> str:
    url = api_url.rstrip("/")
    if url.endswith("/v1"):
        url = url[:-len("/v1")]
    return url


class _Delta:
    __slots__ = ("content", "finish_reason")

    def __init__(self, content: Optional[str], finish_reason: Optional[str]):
        self.content = content
        self.finish_reason = finish_reason


class ChatClient:
    """One client per (api_url, api_key); cheap to cache like the reference's
    client cache (interpolation_engine.py:649-653)."""

    def __init__(self, api_url: str, api_key: str = "unused"):
        self.base = normalize_api_url(api_url)
        self.api_key = api_key
        parsed = urlparse(self.base if "//" in self.base else "http://" + self.base)
        self.scheme = parsed.scheme or "http"
        self.host = parsed.hostname or "localhost"
        self.port = parsed.port or (443 if self.scheme == "https" else 80)
        self.path_prefix = parsed.path.rstrip("/")

    async def stream_chat(self, body: dict) -> AsyncIterator[_Delta]:
        """POST the request and yield streaming deltas."""
        payload = json.dumps(body).encode("utf-8")
        path = f"{self.path_prefix}/v1/chat/completions"
        request = (
            f"POST {path} HTTP/1.1\r\n"
            f"Host: {self.host}:{self.port}\r\n"
            f"Authorization: Bearer {self.api_key}\r\n"
            f"Content-Type: application/json\r\n"
            f"Accept: text/event-stream\r\n"
            f"Content-Length: {len(payload)}\r\n"
            f"Connection: close\r\n\r\n").encode("ascii") + payload

        ssl_ctx = ssl.create_default_context() if self.scheme == "https" else None
        reader, writer = await asyncio.open_connection(
            self.host, self.port, ssl=ssl_ctx)
        try:
            writer.write(request)
            await writer.drain()

            status_line = await reader.readline()
            parts = status_line.decode("latin-1").split(" ", 2)
            if len(parts) < 2 or not parts[1].isdigit():
                raise ChatError(f"malformed HTTP status line: {status_line!r}")
            status = int(parts[1])

            headers = {}
            while True:
                line = await reader.readline()
                if line in (b"\r\n", b"\n", b""):
                    break
                name, _, value = line.decode("latin-1").partition(":")
                headers[name.strip().lower()] = value.strip()

            chunked = headers.get("transfer-encoding", "").lower() == "chunked"
            content_length = int(headers.get("content-length", -1))

            body_stream = self._iter_body(reader, chunked, content_length)

            if status != 200:
                raw = b"".join([chunk async for chunk in body_stream])
                text = raw.decode("utf-8", "replace")
                if ("exceeds the available context size" in text
                        or "Context size has been exceeded" in text):
                    raise OutOfContextError(text)
                raise ChatError(f"chat request failed with HTTP {status}: {text}")

            async for delta in self._iter_sse(body_stream):
                yield delta
        finally:
            writer.close()
            try:
                await writer.wait_closed()
            except Exception:
                pass

    @staticmethod
    async def _iter_body(reader, chunked: bool, content_length: int):
        if chunked:
            while True:
                size_line = await reader.readline()
                try:
                    size = int(size_line.strip().split(b";")[0], 16)
                except ValueError:
                    raise ChatError(f"bad chunk size line: {size_line!r}")
                if size == 0:
                    await reader.readline()
                    return
                data = await reader.readexactly(size)
                await reader.readexactly(2)  # trailing CRLF
                yield data
        elif content_length >= 0:
            remaining = content_length
            while remaining > 0:
                data = await reader.read(min(65536, remaining))
                if not data:
                    return
                remaining -= len(data)
                yield data
        else:
            while True:
                data = await reader.read(65536)
                if not data:
                    return
                yield data

    @staticmethod
    async def _iter_sse(body_stream) -> AsyncIterator[_Delta]:
        buffer = b""
        async for chunk in body_stream:
            buffer += chunk
            while b"\n" in buffer:
                line, buffer = buffer.split(b"\n", 1)
                line = line.strip()
                if not line.startswith(b"data:"):
                    continue
                data = line[len(b"data:"):].strip()
                if data == b"[DONE]":
                    return
                try:
                    event = json.loads(data)
                except json.JSONDecodeError:
                    continue
                choices = event.get("choices") or []
                if not choices:
                    continue
                choice = choices[0]
                content = (choice.get("delta") or {}).get("content")
                yield _Delta(content, choice.get("finish_reason"))
