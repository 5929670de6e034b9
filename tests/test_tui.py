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


def test_rs_file_history_roundtrip(tmp_path):
    """0x1e record-separator format: multi-line entries round-trip and
    plain line files still load (reference ui.rs:762-789)."""
    from interpolation_engine_tpu.io.tui import RsFileHistory

    path = str(tmp_path / "hist")
    h = RsFileHistory(path)
    h.store_string("one")
    h.store_string("two\nlines")
    h.store_string("three")
    raw = open(path).read()
    assert raw.count("\x1e") == 3
    h2 = RsFileHistory(path)
    assert list(h2.load_history_strings()) == ["three", "two\nlines", "one"]

    # plain line-per-entry fallback
    plain = tmp_path / "plain"
    plain.write_text("a\nb\nc\n")
    h3 = RsFileHistory(str(plain))
    assert list(h3.load_history_strings()) == ["c", "b", "a"]


def test_find_history_match():
    from interpolation_engine_tpu.io.tui import find_history_match

    hist = ["make tea", "open door", "make coffee", "walk"]
    assert find_history_match(hist, "") == 3
    assert find_history_match(hist, "make") == 2
    assert find_history_match(hist, "make", start_from=1) == 0
    assert find_history_match(hist, "zzz") is None
    assert find_history_match([], "x") is None


def test_ctrl_r_incremental_search():
    """Ctrl-R enters reverse-i-search, narrows with typed query, repeated
    Ctrl-R steps older, Enter keeps the match, Enter again submits."""
    from prompt_toolkit.input import create_pipe_input
    from prompt_toolkit.output import DummyOutput
    from prompt_toolkit.application import create_app_session

    async def go():
        with create_pipe_input() as pipe:
            with create_app_session(input=pipe, output=DummyOutput()):
                from interpolation_engine_tpu.io.tui import TuiBackend
                tui = TuiBackend()
                io = IOManager(tui)
                await io.start()
                for answer in ("look around", "open door", "look up"):
                    t = asyncio.create_task(io.user_input("> "))
                    await asyncio.sleep(0.05)
                    pipe.send_text(answer + "\r")
                    assert await asyncio.wait_for(t, timeout=5) == answer

                t = asyncio.create_task(io.user_input("> "))
                await asyncio.sleep(0.05)
                pipe.send_text("\x12")          # Ctrl-R → newest entry
                await asyncio.sleep(0.1)
                assert tui._search is not None
                assert tui.input_area.text == "look up"
                assert "reverse-i-search" in tui.info_area.buffer.text
                pipe.send_text("look")          # narrow (still 'look up')
                await asyncio.sleep(0.1)
                assert tui.input_area.text == "look up"
                pipe.send_text("\x12")          # step older
                await asyncio.sleep(0.1)
                assert tui.input_area.text == "look around"
                pipe.send_text("\r")            # accept (no submit)
                await asyncio.sleep(0.1)
                assert tui._search is None
                assert not t.done()
                assert tui.input_area.text == "look around"
                pipe.send_text("\r")            # submit
                assert await asyncio.wait_for(t, timeout=5) == "look around"
                await io.stop()

    asyncio.run(go())


def test_output_scrollback_and_follow():
    from prompt_toolkit.input import create_pipe_input
    from prompt_toolkit.output import DummyOutput
    from prompt_toolkit.application import create_app_session

    async def go():
        with create_pipe_input() as pipe:
            with create_app_session(input=pipe, output=DummyOutput()):
                from interpolation_engine_tpu.io.tui import TuiBackend
                tui = TuiBackend()
                io = IOManager(tui)
                await io.start()
                await io.write("\n".join(f"line{i}" for i in range(50)))
                doc = tui.output_buffer.document
                assert doc.is_cursor_at_the_end      # auto-follow engaged
                tui.scroll_output(-10)
                assert not tui.output_buffer.document.is_cursor_at_the_end
                row = tui.output_buffer.document.cursor_position_row
                assert row == 39
                # scrolled away → writes don't move the view
                await io.write("\nmore")
                assert tui.output_buffer.document.cursor_position_row == 39
                tui.scroll_output(end=True)
                assert tui.output_buffer.document.is_cursor_at_the_end
                tui.scroll_output(home=True)
                assert tui.output_buffer.document.cursor_position == 0
                await io.stop()

    asyncio.run(go())
