"""Esc-menu arbitration on the DEVICE engine (VERDICT r2 missing #2):
Save/Load/Quit flows driven against DeviceProgramRun, mirroring the host
menu tests (test_menu.py) — same option strings, same save-state format,
cross-engine loadable slots."""

import asyncio

from interpolation_engine_tpu import json5
from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend
from interpolation_engine_tpu.vm.driver import DeviceProgramRun

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
    """Scripted backend that triggers the device menu at the program's
    n-th user_input (the device twin of test_menu.MenuScriptedBackend)."""

    def __init__(self, responses, menu_at_input: int, run_holder: dict):
        super().__init__(responses)
        self.n_inputs = 0
        self.menu_at_input = menu_at_input
        self.run_holder = run_holder

    async def user_input(self, prompt: str, default: str = "") -> str:
        self.n_inputs += 1
        if self.n_inputs == self.menu_at_input:
            self.run_holder["run"].toggle_menu()
            await asyncio.Event().wait()  # cancelled by the menu toggle
        if not self.responses:
            await asyncio.Event().wait()
        return await super().user_input(prompt, default)

    async def select_index(self, options, description=None) -> int:
        if not self.responses:
            await asyncio.Event().wait()
        return await super().select_index(options, description)


def run_with_menu(tmp_path, src, responses, menu_at_input=1):
    path = tmp_path / "prog.json5"
    path.write_text(src)
    holder: dict = {}
    backend = MenuScriptedBackend(responses, menu_at_input, holder)
    io = IOManager(backend)
    run = DeviceProgramRun(str(path), [], io)
    holder["run"] = run
    output = asyncio.run(run.run())
    return run, backend, path, output


def test_device_menu_save_then_quit(tmp_path, capsys):
    # Esc at the program's user_input → menu: Save State → slot 1 → label
    # → back in menu → Quit. The saved slot must be in the reference's
    # cursor format (loadable by the host engine too).
    run, backend, path, output = run_with_menu(
        tmp_path, SRC,
        responses=[
            "1",             # menu choice: Save State
            "1",             # slot 1
            "checkpoint-1",  # save label (user_input)
            "4",             # menu: Quit
        ])
    saved = json5.loads(path.read_text())["save_states"]["1"]
    assert saved["label"] == "checkpoint-1"
    assert saved["order_index"] == 3          # parked at the user_input
    assert saved["inserts"] == {"a": "first"}
    assert saved["output"] == "first "
    capsys.readouterr()


def test_device_menu_load_resumes(tmp_path, capsys):
    path_src = SRC.replace(
        "    save_states : {\n    },",
        """    save_states : {
        "3": {
            "inserts": {"a": "first", "b": "loaded-answer"},
            "label": "pre",
            "order_index": 4,
            "output": "first "
        }
    },""")
    path = tmp_path / "prog.json5"
    path.write_text(path_src)
    holder: dict = {}
    backend = MenuScriptedBackend(
        ["2",    # menu: Load State
         "3",    # slot 3
         ],
        menu_at_input=1, run_holder=holder)
    io = IOManager(backend)
    run = DeviceProgramRun(str(path), [], io)
    holder["run"] = run

    async def drive():
        task = asyncio.create_task(run.run())
        while not backend.exchanges or len(backend.exchanges) < 2:
            await asyncio.sleep(0.02)
        await asyncio.sleep(0.1)
        run.toggle_menu()   # close the menu; execution resumes
        return await task

    output = asyncio.run(drive())
    assert output == "first loaded-answer"
    assert capsys.readouterr().out.strip() == "first loaded-answer"


def test_device_menu_slot_loads_on_host_engine(tmp_path, capsys):
    """A slot saved from the DEVICE menu resumes on the HOST engine: the
    splice is the reference format, so the host's Load flow consumes it
    directly (save-format compatibility the reference's own rewrite gave
    up on, rust-project/STATUS.md:23-25)."""
    run, backend, path, _out = run_with_menu(
        tmp_path, SRC,
        responses=["1", "2", "from-device", "4"])
    capsys.readouterr()

    from interpolation_engine_tpu.core.runtime import ProgramRun
    from interpolation_engine_tpu.programs import loader
    loader.invalidate_cache()

    holder: dict = {}

    class SplitBackend(ScriptedBackend):
        """Menu selects and program inputs from separate queues, so the
        still-open menu can't race the post-resume user_input answer."""

        def __init__(self):
            super().__init__([])
            self.selects = ["2",   # menu: Load State
                            "2"]   # slot 2 (saved by the device menu)
            self.inputs = ["typed!"]
            self.n_inputs = 0
            self.n_selects = 0

        async def user_input(self, prompt, default=""):
            self.n_inputs += 1
            if self.n_inputs == 1:
                holder["run"].toggle_menu()
                await asyncio.Event().wait()
            return self.inputs.pop(0)

        async def select_index(self, options, description=None):
            if not self.selects:
                await asyncio.Event().wait()   # menu idles until closed
            self.n_selects += 1
            return int(self.selects.pop(0)) - 1

    backend = SplitBackend()
    io = IOManager(backend)
    host = ProgramRun(str(path), [], io)
    holder["run"] = host

    async def drive():
        task = asyncio.create_task(host.run())
        while backend.n_selects < 2:
            await asyncio.sleep(0.02)
        await asyncio.sleep(0.1)
        host.toggle_menu()   # close the menu; execution resumes
        return await task

    state = asyncio.run(drive())
    assert state["output"] == "first typed!"
    capsys.readouterr()
