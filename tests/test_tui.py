"""Full-screen TUI backend smoke tests (headless via pipe input)."""

import asyncio

import pytest

from interpolation_engine_tpu.io.manager import IOManager


def make_tui():
    from prompt_toolkit.input import create_pipe_input
    from prompt_toolkit.output import DummyOutput
    from prompt_toolkit.application import create_app_session

    return create_pipe_input(), DummyOutput(), create_app_session


def test_tui_write_input_choice_and_menu_hooks():
    from prompt_toolkit.input import create_pipe_input
    from prompt_toolkit.output import DummyOutput
    from prompt_toolkit.application import create_app_session

    events = []

    async def go():
        with create_pipe_input() as pipe:
            with create_app_session(input=pipe, output=DummyOutput()):
                from interpolation_engine_tpu.io.tui import TuiBackend
                tui = TuiBackend(on_menu=lambda: events.append("menu"),
                                 on_kill=lambda: events.append("kill"))
                io = IOManager(tui)
                await io.start()
                await io.write("hello ")
                await io.write("world")
                assert io.output_text == "hello world"
                assert tui.output_buffer.text == "hello world"

                # scripted keystrokes answer the prompt
                input_task = asyncio.create_task(
                    io.user_input("name?\n> "))
                await asyncio.sleep(0.05)
                pipe.send_text("ada\r")   # Enter submits
                answer = await asyncio.wait_for(input_task, timeout=5)
                assert answer == "ada"

                choice_task = asyncio.create_task(
                    io.select_index(["red", "green", "blue"], "pick"))
                await asyncio.sleep(0.05)
                pipe.send_text("2")
                idx = await asyncio.wait_for(choice_task, timeout=5)
                assert idx == 1

                # Esc triggers the menu hook, Ctrl-D the kill hook
                pipe.send_text("\x1b")
                await asyncio.sleep(0.15)
                pipe.send_text("\x04")
                await asyncio.sleep(0.15)

                await io.clear()
                assert io.output_text == ""
                await io.stop()

    asyncio.run(go())
    assert "menu" in events
    assert "kill" in events
