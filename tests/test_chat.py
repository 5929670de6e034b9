"""Chat layer tests against the fake OpenAI-SSE server."""

import asyncio
import json

import pytest

from interpolation_engine_tpu.chat.client import ChatClient, normalize_api_url
from interpolation_engine_tpu.chat.service import run_chat
from interpolation_engine_tpu.core.runtime import async_main
from interpolation_engine_tpu.io.manager import BufferBackend, IOManager, ScriptedBackend

from fake_sse_server import FakeSSEServer


def test_normalize_api_url():
    assert normalize_api_url("http://localhost:8080") == "http://localhost:8080"
    assert normalize_api_url("http://localhost:8080/") == "http://localhost:8080"
    assert normalize_api_url("http://localhost:8080/v1") == "http://localhost:8080"


def run(coro):
    return asyncio.run(coro)


def test_stream_chat_deltas():
    async def go():
        async with FakeSSEServer(lambda body: "hello world") as server:
            client = ChatClient(server.url)
            got = ""
            async for delta in client.stream_chat(
                    {"messages": [], "stream": True}):
                if delta.content:
                    got += delta.content
            assert got == "hello world"
            assert server.requests[0]["request_line"].startswith(
                "POST /v1/chat/completions")
    run(go())


def test_run_chat_with_filters_and_output():
    async def go():
        async with FakeSSEServer(
                lambda body: "<think>secret</think><output>visible</output>") as server:
            io = IOManager(BufferBackend())
            outputs, visual = await run_chat(
                io, messages=[{"role": "user", "content": "hi"}],
                completion_args={"model": "m"},
                start_str="<output>", stop_str="</output>",
                hide_start_str="<think>", hide_stop_str="</think>",
                api_url=server.url)
            assert outputs == ["visible"]
            assert visual == "visible"
            assert io.output_text == "visible"
    run(go())


def test_run_chat_multiple_outputs_enumerated():
    async def go():
        text = "<s>one</s><s>two</s><s>three</s>"
        async with FakeSSEServer(lambda body: text, chunk_size=1) as server:
            io = IOManager(BufferBackend())
            outputs, visual = await run_chat(
                io, messages=[], completion_args={"model": "m"},
                start_str="<s>", stop_str="</s>", n_outputs=3,
                api_url=server.url)
            assert outputs == ["one", "two", "three"]
            assert visual == "1. one\n\n2. two\n\n3. three"
    run(go())


def test_filter_drops_outputs_at_unlucky_chunk_widths():
    """Preserved reference quirk: one toggle per filter update means a chunk
    containing both a close and open delimiter loses an output — the chat
    retry loop exists to compensate (differentially verified)."""
    async def go():
        text = "<s>one</s><s>two</s><s>three</s>"
        async with FakeSSEServer(lambda body: text, chunk_size=3) as server:
            io = IOManager(BufferBackend())
            outputs, _ = await run_chat(
                io, messages=[], completion_args={"model": "m"},
                start_str="<s>", stop_str="</s>", n_outputs=1,
                api_url=server.url)
            assert outputs == ["one", "three"]
    run(go())


def test_run_chat_choices():
    def responder(body):
        # must contain a response_format and a schema prompt message
        assert body["response_format"]["type"] == "json_schema"
        assert "schema" in body["messages"][-1]["content"]
        return json.dumps({"choice": "green"})

    async def go():
        async with FakeSSEServer(responder) as server:
            io = IOManager(BufferBackend())
            outputs, _ = await run_chat(
                io, messages=[{"role": "user", "content": "pick"}],
                completion_args={"model": "m"},
                choices_list=["red", "green"], shown=False,
                api_url=server.url)
            assert outputs == ["green"]
    run(go())


def test_extra_body_merged_top_level():
    seen = {}

    def responder(body):
        seen.update(body)
        return "ok"

    async def go():
        async with FakeSSEServer(responder) as server:
            io = IOManager(BufferBackend())
            await run_chat(io, messages=[], completion_args={"model": "m"},
                           extra_body={"grammar": "root ::= .*"},
                           api_url=server.url)
    run(go())
    assert seen["grammar"] == "root ::= .*"
    assert seen["model"] == "m"


def test_chat_command_end_to_end(tmp_path, capsys):
    """Full program with a chat task against the fake server."""
    def responder(body):
        user = body["messages"][-1]["content"]
        return f"<output>echo:{user}</output>"

    async def go():
        async with FakeSSEServer(responder) as server:
            prog = tmp_path / "chatprog.json5"
            prog.write_text("""
            {
                default_state: {order_index: 1, inserts: {topic: 'cats'}},
                order: [
                    {cmd:'chat', output_name:'reply', shown:true,
                     start_str:'<output>', stop_str:'</output>',
                     messages:[
                        {role:'user', content:'tell me about {topic}'},
                     ]},
                    {cmd:'print', text:'\\n[{reply}]'},
                ],
                named_tasks: {},
                save_states: {},
                completion_args: {
                    model: 'fake-model',
                    api_url: '%URL%',
                },
            }
            """.replace("%URL%", server.url))
            io = IOManager(ScriptedBackend())
            state = await async_main(str(prog), [], io)
            return state

    state = run(go())
    assert state["inserts"]["reply"] == "echo:tell me about cats"
    assert state["output"] == "echo:tell me about cats\n[echo:tell me about cats]"
    out = capsys.readouterr().out
    assert out == "echo:tell me about cats\n[echo:tell me about cats]\n"


def test_chat_retry_on_underdelivery(tmp_path):
    calls = {"n": 0}

    def responder(body):
        calls["n"] += 1
        if calls["n"] == 1:
            return "<s>only one</s>"
        return "<s>a</s><s>b</s>"

    async def go():
        async with FakeSSEServer(responder) as server:
            io = IOManager(BufferBackend())
            from interpolation_engine_tpu.core.executor import Runtime, execute_task
            rt = Runtime(io, completion_args={"model": "m", "api_url": server.url})
            state = {"inserts": {}, "output": ""}
            task = {"cmd": "chat", "output_name": "o", "n_outputs": 2,
                    "start_str": "<s>", "stop_str": "</s>", "shown": False,
                    "messages": [], "traceback_label": "chat-1"}
            # shrink the retry backoff for the test
            import interpolation_engine_tpu.core.executor as ex
            orig_sleep = asyncio.sleep
            async def fast_sleep(t):
                await orig_sleep(0)
            ex.asyncio.sleep = fast_sleep
            try:
                await execute_task(rt, state, task, "chat-1")
            finally:
                ex.asyncio.sleep = orig_sleep
            return state

    state = run(go())
    assert state["inserts"]["o"] == ["a", "b"]
    assert calls["n"] == 2


def test_out_of_context_modal():
    async def go():
        async with FakeSSEServer(lambda body: ("truncated", "length")) as server:
            io = IOManager(ScriptedBackend())
            # out-of-context modal is an empty-options select_index that blocks
            # until cancelled; give it a task wrapper and cancel after a tick
            task = asyncio.create_task(run_chat(
                io, messages=[], completion_args={"model": "m"},
                shown=False, api_url=server.url))
            await asyncio.sleep(0.2)
            assert not task.done()  # parked on the modal
            task.cancel()
            try:
                await task
            except (asyncio.CancelledError, RuntimeError):
                pass
    run(go())


def test_run_chat_device_filter_fast_path(monkeypatch):
    """IE_TPU_DEVICE_FILTERS=1: raw stream + one device filter-kernel call
    replaces the per-chunk Python state machines; outputs and visual text
    match the incremental path at token granularity."""
    monkeypatch.setenv("IE_TPU_DEVICE_FILTERS", "1")
    text = ("<think>hidden plan</think>junk <output>first</output> mid "
            "<output>second</output> tail")

    async def go():
        async with FakeSSEServer(lambda body: text, chunk_size=1) as server:
            io = IOManager(BufferBackend())
            outputs, visual = await run_chat(
                io, messages=[{"role": "user", "content": "hi"}],
                completion_args={"model": "m"},
                start_str="<output>", stop_str="</output>", n_outputs=2,
                hide_start_str="<think>", hide_stop_str="</think>",
                api_url=server.url)
            assert outputs == ["first", "second"]
            assert visual == "1. first\n\n2. second"
            assert io.output_text == visual

    asyncio.run(go())
    # same flow, flag off, 1-byte chunks — identical result
    monkeypatch.delenv("IE_TPU_DEVICE_FILTERS")

    async def ref():
        async with FakeSSEServer(lambda body: text, chunk_size=1) as server:
            io = IOManager(BufferBackend())
            return await run_chat(
                io, messages=[{"role": "user", "content": "hi"}],
                completion_args={"model": "m"},
                start_str="<output>", stop_str="</output>", n_outputs=2,
                hide_start_str="<think>", hide_stop_str="</think>",
                api_url=server.url)

    ref_outputs, ref_visual = asyncio.run(ref())
    assert ref_outputs == ["first", "second"]
    assert ref_visual == "1. first\n\n2. second"
