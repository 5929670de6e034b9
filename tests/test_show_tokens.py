"""show-tokenization CLI (P16) against the fake SSE server: alternating
color codes per streamed token, token count, echo-mismatch warning."""

import asyncio

import pytest

from interpolation_engine_tpu.tools.show_tokens import main, stream_tokens

from fake_sse_server import FakeSSEServer


def run_main(argv, capsys):
    rc = main(argv)
    out, err = capsys.readouterr()
    return rc, out, err


def test_show_tokens_alternating_colors(capsys):
    async def go():
        async with FakeSSEServer(
                lambda body: body["messages"][-1]["content"],
                chunk_size=3) as server:
            await stream_tokens("hello world!", "m", server.url, "k")

    asyncio.run(go())
    out, err = capsys.readouterr()
    # 12 chars at chunk_size=3 → 4 deltas, colors alternating
    assert out.count("\033[48;5;24m") == 2
    assert out.count("\033[48;5;88m") == 2
    assert "hel" in out and "lo " in out
    assert "(4 tokens)" in err
    assert "WARNING" not in err


def test_show_tokens_mismatch_warning(capsys):
    async def go():
        async with FakeSSEServer(lambda body: "something else",
                                 chunk_size=100) as server:
            await stream_tokens("hello", "m", server.url, "k")

    asyncio.run(go())
    _, err = capsys.readouterr()
    assert "WARNING: the echoed text does not match" in err


def test_show_tokens_cli_entry(capsys):
    server_holder = {}

    async def go():
        async with FakeSSEServer(
                lambda body: body["messages"][-1]["content"],
                chunk_size=2) as server:
            # main() runs its own asyncio.run; call the coroutine directly
            await stream_tokens("abcd", "m", server.url, "k")
            server_holder["requests"] = server.requests

    asyncio.run(go())
    out, err = capsys.readouterr()
    assert "(2 tokens)" in err
    body = server_holder["requests"][0]["body"]
    assert body["temperature"] == 0 and body["stream"] is True
    assert body["messages"][0]["role"] == "system"
