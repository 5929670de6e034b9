"""A fake OpenAI-compatible streaming chat-completions server for tests.

Implements just enough of the llama.cpp/OpenAI surface the chat layer
touches: POST /v1/chat/completions with stream:true → SSE `data:` lines of
chat.completion.chunk events terminated by `data: [DONE]`.

The response text is computed by a user-supplied callable
``responder(body) -> str | (str, finish_reason)`` so tests can script
scenario-dependent outputs (and assert on the request bodies received).
"""

from __future__ import annotations

import asyncio
import json


class FakeSSEServer:
    def __init__(self, responder, chunk_size: int = 3):
        self.responder = responder
        self.chunk_size = chunk_size
        self.requests: list[dict] = []
        self._server = None
        self.port = None

    async def __aenter__(self):
        self._server = await asyncio.start_server(self._handle, "127.0.0.1", 0)
        self.port = self._server.sockets[0].getsockname()[1]
        return self

    async def __aexit__(self, *exc):
        self._server.close()
        await self._server.wait_closed()

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    async def _handle(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter):
        try:
            request_line = await reader.readline()
            headers = {}
            while True:
                line = await reader.readline()
                if line in (b"\r\n", b"\n", b""):
                    break
                name, _, value = line.decode("latin-1").partition(":")
                headers[name.strip().lower()] = value.strip()
            length = int(headers.get("content-length", 0))
            body = json.loads(await reader.readexactly(length)) if length else {}
            self.requests.append(
                {"request_line": request_line.decode().strip(), "body": body})

            result = self.responder(body)
            finish_reason = "stop"
            if isinstance(result, tuple):
                text, finish_reason = result
            else:
                text = result

            writer.write(b"HTTP/1.1 200 OK\r\n"
                         b"Content-Type: text/event-stream\r\n"
                         b"Transfer-Encoding: chunked\r\n"
                         b"Connection: close\r\n\r\n")

            def chunk(data: bytes):
                writer.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")

            for i in range(0, len(text), self.chunk_size):
                event = {
                    "id": "chatcmpl-fake",
                    "object": "chat.completion.chunk",
                    "choices": [{
                        "index": 0,
                        "delta": {"content": text[i:i + self.chunk_size]},
                        "finish_reason": None,
                    }],
                }
                chunk(b"data: " + json.dumps(event).encode() + b"\n\n")
                await writer.drain()

            final = {
                "id": "chatcmpl-fake",
                "object": "chat.completion.chunk",
                "choices": [{
                    "index": 0,
                    "delta": {"content": None},
                    "finish_reason": finish_reason,
                }],
            }
            chunk(b"data: " + json.dumps(final).encode() + b"\n\n")
            chunk(b"data: [DONE]\n\n")
            chunk(b"")
            await writer.drain()
        except (ConnectionResetError, asyncio.IncompleteReadError):
            pass
        finally:
            writer.close()
