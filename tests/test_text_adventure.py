"""text_adventure.json5 end-to-end: the reference's stress-test program.

Exercises the goto_map state machine, parallel_race of generation-vs-input,
chat streaming with extraction filters, await_insert handshakes, delete_except
GC and list surgery — against the fake SSE server with scripted inputs.
"""

import asyncio

import pytest

from interpolation_engine_tpu.core.runtime import ProgramRun
from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend

from fake_sse_server import FakeSSEServer

EXAMPLES = "/root/reference/examples"


class BlockingScriptedBackend(ScriptedBackend):
    """Blocks (instead of raising) when responses run out — lets the test
    drive N turns and then observe the quiesced state."""

    async def user_input(self, prompt: str, default: str = "") -> str:
        if not self.responses:
            await asyncio.Event().wait()
        return await super().user_input(prompt, default)


def make_adventure_program(tmp_path, api_url):
    """Copy text_adventure.json5 with completion_args pointing at the fake."""
    with open(f"{EXAMPLES}/text_adventure.json5") as f:
        src = f.read()
    src = src.replace(
        'model: "bartowski_Mistral-Nemo-Instruct-2407-GGUF_Mistral-Nemo-Instruct-2407-Q8_0",',
        f'model: "fake", api_url: "{api_url}",')
    path = tmp_path / "text_adventure.json5"
    path.write_text(src)
    return str(path)


def test_text_adventure_two_turns(tmp_path, capsys):
    counter = {"n": 0}

    def responder(body):
        user = body["messages"][-1]["content"]
        counter["n"] += 1
        if "Write the best possible starting output" in user:
            return "<output>You wake in a cold cabin.</output>"
        if "next output in response to the player's last action" in user:
            return "<output>The door creaks open.</output>"
        if "<query>" in user:
            return "<output>It is the year 3021.</output>"
        return "<output>???</output>"

    async def go():
        async with FakeSSEServer(responder, chunk_size=2) as server:
            path = make_adventure_program(tmp_path, server.url)
            backend = BlockingScriptedBackend([
                "A lonely arctic outpost.",   # scenario
                "open the door",              # turn 1 action
                "(what year is it)",          # turn 2 query
            ])
            io = IOManager(backend)
            run = ProgramRun(path, [], io)
            task = asyncio.create_task(run.run())
            # wait until all scripted responses are consumed and the program
            # quiesces at the turn-3 input/await_insert deadlock
            for _ in range(400):
                await asyncio.sleep(0.05)
                if not backend.responses and counter["n"] >= 3:
                    break
            await asyncio.sleep(0.3)
            state = run.state
            run.kill()  # graceful: like the user hitting Ctrl-D
            await task
            return state, backend

    state, backend = asyncio.run(go())
    capsys.readouterr()

    inserts = state["inserts"]
    assert inserts["scenario"] == "A lonely arctic outpost."
    assert inserts["history_list"] == [
        "<action-output>You wake in a cold cabin.</action-output>",
        "<action>open the door</action>",
        "<action-output>The door creaks open.</action-output>",
        "<query>(what year is it)</query>",
    ]
    assert inserts["stage"] == "query"
    # the on-screen history had markup stripped by the replace_map pipeline
    assert "You wake in a cold cabin." in backend.output_text
    assert "> open the door" in backend.output_text
    assert "<action>" not in backend.output_text
