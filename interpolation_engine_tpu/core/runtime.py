"""Order interpreter: main loop, menu arbitration, save/load, reload.

Behavioral contract (reference: interpolation_engine.py:2046-2131,
:2336-2405): a 1-based ``order_index`` walks ``program['order']``; ``None``
results advance, goto results jump to ``index(label) + 2``; SIGINT/Esc
cancels the in-flight task and opens the menu (Save/Load/Reload/Quit with
nine save slots); on normal termination ``state['output'].strip()`` is
printed to stdout.
"""

from __future__ import annotations

import asyncio
import copy
import os
import signal

from .context import CTX, ESCAPE, INSERT_START, INSERT_STOP, log
from .executor import Runtime, execute_task
from .persistence import save_program
from ..io import tts as tts_mod
from ..programs.loader import load


class ProgramRun:
    """One program execution: state + menu arbitration."""

    def __init__(self, filepath: str, args: list[str], io):
        self.filepath = filepath
        self.args = args
        self.io = io
        self.killme = False
        self.menu_open = False
        self.current_task: asyncio.Task | None = None
        self.state: dict | None = None  # live view for embedders/tests
        self.program: dict | None = None

    def toggle_menu(self):
        if self.current_task:
            self.current_task.cancel()
        self.menu_open = not self.menu_open

    def kill(self):
        self.killme = True
        if self.current_task:
            self.current_task.cancel()

    # ---- menu ----------------------------------------------------------------

    async def main_menu(self, program, state, completion_args, named_tasks):
        status = ""
        while True:
            options = ["Save State", "Load State", "Reload and Restart", "Quit"]
            choice = options[await self.io.select_index(
                options, description=f"\n{status}")]
            log(f"🛈 user picked '{choice}'")

            if choice == "Save State":
                slot_states = [
                    program["save_states"].get(str(slot), {"label": "(Empty Slot)"})
                    for slot in range(1, 10)]
                labels = [s["label"] for s in slot_states]
                choice_i = await self.io.select_index(labels, description="")
                label = labels[choice_i]
                save_label = await self.io.user_input(
                    prompt="What do you want to call this save state?\n> ",
                    default=label if label != "(Empty Slot)" else "")
                program["save_states"][str(choice_i + 1)] = copy.deepcopy(state)
                program["save_states"][str(choice_i + 1)]["label"] = save_label
                save_program(program, self.filepath)
                status = f"\nSaved '{save_label}' to slot {choice_i + 1}.\n"
                log(f"🛈 saved slot {choice_i + 1}")

            elif choice == "Load State":
                slot_states = [
                    program["save_states"].get(str(slot), {"label": "(Empty Slot)"})
                    for slot in range(1, 10)]
                labels = [s.get("label", "(Unlabelled Slot)") for s in slot_states]
                choice_i = await self.io.select_index(labels, description="")
                if labels[choice_i] == "(Empty Slot)":
                    status = "\nCannot load empty slot.\n"
                    continue
                state.clear()
                state.update(copy.deepcopy(slot_states[choice_i]))
                state["output"] = state.get("output", "")
                await self.io.write(state["output"])
                status = f"\nLoaded '{state['label']}' from slot {choice_i + 1}.\n"
                log(f"🛈 Loaded slot {choice_i + 1} ({labels[choice_i]}).")

            elif choice == "Reload and Restart":
                new_program, new_state = load(self.filepath)
                program_args = {
                    k: v for k, v in state["inserts"].items()
                    if k[:3] == "ARG" and k[3:].isnumeric()}
                program.clear()
                program.update(copy.deepcopy(new_program))
                state.clear()
                state.update(copy.deepcopy(new_state))
                state["inserts"].update(program_args)
                completion_args.clear()
                completion_args.update(copy.deepcopy(program.get("completion_args", {})))
                named_tasks.clear()
                named_tasks.update(copy.deepcopy(program.get("named_tasks", {})))
                status = "\nRestarted Program after reloading.\n"
                log("🛈 Restarted Program.")

            elif choice == "Quit":
                self.kill()
                return

    # ---- main loop -------------------------------------------------------------

    async def run(self) -> dict:
        CTX.program_dir = os.path.dirname(os.path.abspath(self.filepath))
        program, state = load(self.filepath)
        self.program, self.state = program, state

        # ARG1..ARGn, always stored escaped (programs opt into `unescape`).
        for i, arg in enumerate(self.args, start=1):
            state["inserts"][f"ARG{i}"] = (
                arg.replace(INSERT_START, ESCAPE + INSERT_START)
                   .replace(INSERT_STOP, ESCAPE + INSERT_STOP))

        completion_args = program.get("completion_args", {})
        named_tasks = program.get("named_tasks", {})
        rt = Runtime(self.io, completion_args, named_tasks)

        order = program["order"]
        if order:
            await self.io.start()
            await asyncio.sleep(0)
            await self.io.write(state.get("output", ""))

        loop = asyncio.get_running_loop()
        try:
            loop.add_signal_handler(signal.SIGINT, self.toggle_menu)
        except (NotImplementedError, RuntimeError):
            pass  # non-main thread or platform without signal support

        while state["order_index"] <= len(order):
            if self.menu_open:
                self.current_task = loop.create_task(
                    self.main_menu(program, state, completion_args, named_tasks))
            else:
                task = order[state["order_index"] - 1]
                await self.io.clear()
                await self.io.write(state["output"])
                self.current_task = loop.create_task(execute_task(
                    rt, state, task, f"{task['traceback_label']}"))

            try:
                result = await self.current_task
                if result is None:
                    state["order_index"] += 1
                elif isinstance(result, dict) and "goto_target" in result:
                    target = result["goto_target"]
                    state["order_index"] = 2 + min(
                        i for i in range(len(order))
                        if order[i]["cmd"] == "label" and order[i]["name"] == target)
                else:
                    raise Exception(f"Task returned unexpected value: {result}.")
            except asyncio.CancelledError:
                # In-flight task cancellation (menu toggle / kill) is part of
                # normal arbitration; cancellation of run() itself propagates.
                current = asyncio.current_task()
                if current is not None and current.cancelling() > 0:
                    raise

            if self.killme:
                log("🛈 Terminated by user.")
                tts_mod.stop_current_tts()
                break
        else:
            log("🛈 Reached end of order list.")

        if order:
            await self.io.stop()
        tts_mod.stop_current_tts()
        print(state["output"].strip())
        return state


async def async_main(filepath: str, args: list[str], io) -> dict:
    assert filepath, (
        "Specify a single program (.json5 file) to run and optionally pass "
        "arguments that the program will handle.")
    run = ProgramRun(filepath, args, io)
    # full-screen backends route Esc/Ctrl-D into the runtime menu arbitration
    backend = getattr(io, "backend", None)
    if backend is not None and hasattr(backend, "on_menu"):
        backend.on_menu = run.toggle_menu
        backend.on_kill = run.kill
    return await run.run()
