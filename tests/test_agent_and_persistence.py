"""Agent file protocol + save/load round-trip tests."""

import asyncio
import json
import os
import shutil

import pytest

from interpolation_engine_tpu.core.persistence import splice_key_into_json5
from interpolation_engine_tpu.core.runtime import async_main
from interpolation_engine_tpu.io.manager import AgentBackend, IOManager
from interpolation_engine_tpu import json5

EXAMPLES = "/root/reference/examples"


class AgentDriver:
    """Drives a program over the agent file protocol, like an external agent."""

    def __init__(self, tmp_path, responses):
        self.output_path = str(tmp_path / "agent_output")
        self.input_path = str(tmp_path / "agent_input")
        self.responses = list(responses)
        self.payloads = []

    async def drive(self):
        while self.responses:
            while not os.path.exists(self.output_path):
                await asyncio.sleep(0.01)
            with open(self.output_path) as f:
                payload = json.loads(f.read())
            os.remove(self.output_path)
            self.payloads.append(payload)
            with open(self.input_path, "w") as f:
                f.write(self.responses.pop(0))


def test_agent_mode_interactivity(tmp_path, capsys):
    backend = AgentBackend(str(tmp_path / "agent_output"),
                           str(tmp_path / "agent_input"))
    backend.POLL_INTERVAL = 0.01
    io = IOManager(backend)
    driver = AgentDriver(tmp_path, ["ada\n", "2"])

    async def both():
        driver_task = asyncio.create_task(driver.drive())
        state = await async_main(f"{EXAMPLES}/interactivity.json5", [], io)
        await driver_task
        return state

    state = asyncio.run(both())
    assert state["inserts"]["greeting"] == "Well, ada, I hope you have a great day."

    # protocol payload shapes
    first, second = driver.payloads
    assert first["type"] == "user_input"
    assert set(first.keys()) == {"type", "output", "prompt"}
    assert second["type"] == "user_choice"
    assert set(second.keys()) == {"type", "output", "prompt", "choices"}
    assert second["choices"] == {
        "1": "Morning", "2": "Noon", "3": "Evening", "4": "Night"}
    capsys.readouterr()


def test_agent_choice_by_option_text(tmp_path, capsys):
    backend = AgentBackend(str(tmp_path / "agent_output"),
                           str(tmp_path / "agent_input"))
    backend.POLL_INTERVAL = 0.01
    io = IOManager(backend)
    driver = AgentDriver(tmp_path, ["ada\n", "Evening"])

    async def both():
        driver_task = asyncio.create_task(driver.drive())
        state = await async_main(f"{EXAMPLES}/interactivity.json5", [], io)
        await driver_task
        return state

    state = asyncio.run(both())
    assert state["inserts"]["time"] == "Evening"
    capsys.readouterr()


# ---- persistence --------------------------------------------------------------


def test_splice_preserves_comments(tmp_path):
    original = """{
    // a precious comment
    default_state: {order_index: 1, inserts: {}},
    order: [
        {cmd:'print', text:'x'}, // another comment
    ],
    named_tasks: {},
    save_states : {
    },
}
"""
    new = splice_key_into_json5(original, "save_states",
                                {"1": {"label": "s", "order_index": 2}})
    assert "// a precious comment" in new
    assert "// another comment" in new
    parsed = json5.loads(new)
    assert parsed["save_states"] == {"1": {"label": "s", "order_index": 2}}


def test_splice_roundtrip_preserves_existing_format(tmp_path):
    with open(f"{EXAMPLES}/interactivity.json5") as f:
        original = f.read()
    program = json5.loads(original)
    # splice the same save_states back; document must still parse identically
    new = splice_key_into_json5(original, "save_states", program["save_states"])
    assert json5.loads(new)["save_states"] == program["save_states"]


def test_save_load_roundtrip(tmp_path, capsys):
    """Save mid-run state into the file, reload it, resume, same result."""
    from interpolation_engine_tpu.core.persistence import save_program
    from interpolation_engine_tpu.programs.loader import load, invalidate_cache

    prog_path = tmp_path / "prog.json5"
    prog_path.write_text("""
    {
        default_state: {order_index: 1, inserts: {}},
        order: [
            {cmd:'set', item:'v1', output_name:'a'},
            {cmd:'print', text:'{a}'},
        ],
        named_tasks: {},
        save_states: {},
    }
    """)
    program, state = load(str(prog_path))
    # simulate a mid-run state incl. a nested block cursor
    state["inserts"]["a"] = "v1"
    state["order_index"] = 2
    state["order_index/serial-9/print-3"] = 2
    import copy
    program["save_states"]["3"] = copy.deepcopy(state)
    program["save_states"]["3"]["label"] = "midway"
    save_program(program, str(prog_path))

    invalidate_cache()
    program2, _ = load(str(prog_path))
    loaded = program2["save_states"]["3"]
    assert loaded["label"] == "midway"
    del loaded["label"]
    assert loaded == state  # bit-exact state round-trip

    # resuming from the loaded state produces the same output
    from interpolation_engine_tpu.core.executor import Runtime, execute_task
    from interpolation_engine_tpu.io.manager import BufferBackend, IOManager
    io = IOManager(BufferBackend())
    rt = Runtime(io)
    task = program2["order"][1]
    asyncio.run(execute_task(rt, loaded, task, task["traceback_label"]))
    assert loaded["output"] == "v1"
