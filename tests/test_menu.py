"""Runtime menu: save / load / reload-and-restart / quit flows."""

import asyncio

import pytest

from interpolation_engine_tpu import json5
from interpolation_engine_tpu.core.runtime import ProgramRun
from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend

SRC = """
{
    default_state: {order_index: 1, inserts: {}},
    order: [
        {cmd:'set', item:'first', output_name:'a'},
        {cmd:'print', text:'{a} '},
        {cmd:'user_input', prompt:'> ', output_name:'b'},
        {cmd:'print', text:'{b}'},
    ],
    named_tasks: {},
    save_states : {
    },
}
"""


class MenuScriptedBackend(ScriptedBackend):
    """Scripted backend that can trigger the menu at a scripted moment."""

    def __init__(self, responses, menu_at_input: int, run_holder: dict):
        super().__init__(responses)
        self.n_inputs = 0
        self.menu_at_input = menu_at_input
        self.run_holder = run_holder

    async def user_input(self, prompt: str, default: str = "") -> str:
        self.n_inputs += 1
        if self.n_inputs == self.menu_at_input:
            # simulate Esc: cancel the in-flight task, open the menu
            self.run_holder["run"].toggle_menu()
            await asyncio.Event().wait()  # cancelled by the menu toggle
        if not self.responses:
            await asyncio.Event().wait()  # park until cancelled externally
        return await super().user_input(prompt, default)

    async def select_index(self, options, description=None) -> int:
        if not self.responses:
            await asyncio.Event().wait()  # park until cancelled externally
        return await super().select_index(options, description)


def run_with_menu(tmp_path, responses, menu_at_input=1):
    path = tmp_path / "prog.json5"
    path.write_text(SRC)
    holder: dict = {}
    backend = MenuScriptedBackend(responses, menu_at_input, holder)
    io = IOManager(backend)
    run = ProgramRun(str(path), [], io)
    holder["run"] = run
    state = asyncio.run(run.run())
    return state, backend, path


def test_menu_save_then_quit(tmp_path, capsys):
    # Esc at the program's user_input → menu: Save State → slot 1 → label →
    # back in menu → Quit
    state, backend, path = run_with_menu(
        tmp_path,
        responses=[
            "1",            # menu choice: Save State
            "1",            # slot 1
            "checkpoint-1",  # save label (user_input)
            "4",            # menu: Quit
        ])
    saved = json5.loads(path.read_text())["save_states"]["1"]
    assert saved["label"] == "checkpoint-1"
    assert saved["order_index"] == 3          # parked at the user_input task
    assert saved["inserts"] == {"a": "first"}
    assert saved["output"] == "first "
    capsys.readouterr()


def test_menu_load_resumes(tmp_path, capsys):
    path = tmp_path / "prog.json5"
    # pre-seed a save at order_index 4 with b already answered
    src = SRC.replace(
        "    save_states : {\n    },",
        """    save_states : {
        "3": {
            "inserts": {"a": "first", "b": "loaded-answer"},
            "label": "pre",
            "order_index": 4,
            "output": "first "
        }
    },""")
    path.write_text(src)
    holder: dict = {}
    backend = MenuScriptedBackend(
        ["2",    # menu: Load State
         "3",    # slot 3
         ],
        menu_at_input=1, run_holder=holder)
    io = IOManager(backend)
    run = ProgramRun(str(path), [], io)
    holder["run"] = run

    async def drive():
        # after loading, the menu loop continues; close it so execution
        # resumes: toggling the menu again cancels the menu task
        task = asyncio.create_task(run.run())
        while not backend.exchanges or len(backend.exchanges) < 2:
            await asyncio.sleep(0.02)
        await asyncio.sleep(0.1)
        run.toggle_menu()
        return await task

    state = asyncio.run(drive())
    assert state["inserts"]["b"] == "loaded-answer"
    assert state["output"] == "first loaded-answer"
    assert capsys.readouterr().out.strip() == "first loaded-answer"


def test_menu_reload_and_restart(tmp_path, capsys):
    state, backend, path = run_with_menu(
        tmp_path,
        responses=[
            "3",      # menu: Reload and Restart
            "4",      # back in menu: Quit
        ])
    # reload resets to the start; quit terminates before re-running
    assert state["order_index"] == 1
    capsys.readouterr()
