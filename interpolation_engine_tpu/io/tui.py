"""Full-screen terminal UI backend.

Capability parity with the reference TUIs (reference: the prompt_toolkit app
at interpolation_engine.py:49-416 and the ratatui thread at
rust-project/src/ui.rs:21-1095): a scrolling output pane with scrollback
(PageUp/PageDown, Ctrl-Up/Down, Ctrl-Home/End, mouse wheel, auto-follow
that re-engages at the bottom), a conditional input area with a multi-line
prompt, keyed choice menus (1-9 / a-z), Esc toggles the runtime menu,
Ctrl-D terminates, Ctrl-N inserts a newline in the input, Up/Down walk
persistent input history, and Ctrl-R incremental reverse history search
(query shown as ``reverse-i-search:``, repeated Ctrl-R steps to older
matches, Esc restores the original buffer — ui.rs:380-425, 521-640).

History records use the reference's 0x1e record-separator format so
multi-line entries round-trip and history files are interchangeable with
the reference TUI (ui.rs:762-789).

Implemented as an asyncio prompt_toolkit Application (the host runtime is a
single event loop, so no dedicated UI thread is needed — that was a tokio
design constraint, not a requirement).
"""

from __future__ import annotations

import asyncio
import os
from typing import Optional

from prompt_toolkit.application import Application
from prompt_toolkit.buffer import Buffer
from prompt_toolkit.document import Document
from prompt_toolkit.filters import Condition
from prompt_toolkit.history import History, InMemoryHistory
from prompt_toolkit.key_binding import KeyBindings
from prompt_toolkit.layout import ConditionalContainer, HSplit, Layout, Window
from prompt_toolkit.layout.controls import BufferControl
from prompt_toolkit.styles import Style
from prompt_toolkit.widgets import TextArea

from ..core.context import CTX
from .manager import BufferBackend, choice_keys

HISTORY_RS = "\x1e"  # record separator between (possibly multi-line) entries


class RsFileHistory(History):
    """Reference-format history file: ``entry\\n\\x1e\\n`` per record
    (ui.rs:762-789). Plain line-per-entry files load too (the fallback the
    reference applies when no 0x1e byte is present)."""

    def __init__(self, filename: str):
        super().__init__()
        self.filename = filename

    def load_history_strings(self):
        try:
            with open(self.filename, encoding="utf-8",
                      errors="replace") as f:
                raw = f.read()
        except OSError:
            return
        if HISTORY_RS in raw:
            entries = [e.strip("\n") for e in raw.split(HISTORY_RS)]
        else:
            entries = raw.splitlines()
        # newest first, as prompt_toolkit expects
        for e in reversed([e for e in entries if e]):
            yield e

    def store_string(self, string: str) -> None:
        try:
            os.makedirs(os.path.dirname(self.filename) or ".",
                        exist_ok=True)
            with open(self.filename, "a", encoding="utf-8") as f:
                f.write(string + "\n" + HISTORY_RS + "\n")
        except OSError:
            pass


def find_history_match(history: list, query: str,
                       start_from: Optional[int] = None) -> Optional[int]:
    """Last index <= start_from whose entry contains query (ui.rs:791-807);
    history is oldest-first."""
    if not history:
        return None
    idx = start_from if start_from is not None else len(history) - 1
    if idx < 0:
        return None
    while True:
        if query in history[idx]:
            return idx
        if idx == 0:
            return None
        idx -= 1


class TuiBackend(BufferBackend):
    """Full-screen IO backend; the runtime injects menu/kill callbacks."""

    def __init__(self, on_menu=None, on_kill=None):
        super().__init__()
        self.on_menu = on_menu or (lambda: None)
        self.on_kill = on_kill or (lambda: None)

        history = (RsFileHistory(CTX.prompt_history_path)
                   if CTX.prompt_history_path else InMemoryHistory())

        self.show_prompt = False
        self.show_info = False
        self.prompt_prefix = ""
        self._input_future: Optional[asyncio.Future] = None
        self._app_task: Optional[asyncio.Task] = None
        # Ctrl-R incremental search state (None = not searching):
        # {"query", "original", "match_index"} — ui.rs Mode::Search
        self._search: Optional[dict] = None

        self.output_buffer = Buffer()
        self.output_window = Window(
            content=BufferControl(buffer=self.output_buffer),
            wrap_lines=True,
            always_hide_cursor=True)

        self.info_area = TextArea(focusable=False, wrap_lines=True,
                                  style="class:input-field")
        self.input_area = TextArea(
            height=None,
            dont_extend_height=True,
            history=history,
            wrap_lines=True,
            multiline=True,
            get_line_prefix=lambda i, n: (self.prompt_prefix if i == 0
                                          else " " * len(self.prompt_prefix)),
            style="class:input-field",
            read_only=Condition(lambda: not self.show_prompt),
        )

        kb = KeyBindings()
        searching = Condition(lambda: self._search is not None)

        @kb.add("c-d")
        def _(event):
            self.on_kill()

        @kb.add("escape", filter=~searching)
        def _(event):
            self.on_menu()

        @kb.add("c-n")
        def _(event):
            if self.show_prompt:
                self.input_area.buffer.insert_text("\n")

        @kb.add("enter", filter=~searching)
        def _(event):
            if (self.show_prompt and self._input_future
                    and not self._input_future.done()):
                text = self.input_area.text
                try:
                    self.input_area.buffer.history.append_string(text)
                except Exception:
                    pass
                self._input_future.set_result(text)
            else:
                event.app.current_buffer.newline()

        # ---- Ctrl-R incremental reverse history search (ui.rs:380-640) ----

        @kb.add("c-r", filter=~searching
                & Condition(lambda: self.show_prompt))
        def _(event):
            self.start_search()

        @kb.add("c-r", filter=searching)
        def _(event):
            self.search_step()

        @kb.add("escape", filter=searching)
        def _(event):
            self.cancel_search()

        @kb.add("enter", filter=searching)
        def _(event):
            self.accept_search()

        @kb.add("backspace", filter=searching)
        def _(event):
            s = self._search
            s["query"] = s["query"][:-1]
            self._search_refresh(start_from=None)

        @kb.add("<any>", filter=searching)
        def _(event):
            if event.data and event.data.isprintable():
                self._search["query"] += event.data
                self._search_refresh(start_from=None)

        # ---- output scrollback (ui.rs:701-760) ----------------------------

        @kb.add("pageup")
        def _(event):
            self.scroll_output(-self._page_rows())

        @kb.add("pagedown")
        def _(event):
            self.scroll_output(self._page_rows())

        @kb.add("c-up")
        def _(event):
            self.scroll_output(-1)

        @kb.add("c-down")
        def _(event):
            self.scroll_output(1)

        @kb.add("c-home")
        def _(event):
            self.scroll_output(home=True)

        @kb.add("c-end")
        def _(event):
            self.scroll_output(end=True)

        self.kb = kb
        self.app = Application(
            layout=Layout(
                HSplit([
                    self.output_window,
                    ConditionalContainer(
                        self.info_area,
                        filter=Condition(lambda: self.show_info)),
                    ConditionalContainer(
                        self.input_area,
                        filter=Condition(lambda: self.show_prompt)),
                ]),
                focused_element=self.input_area,
            ),
            key_bindings=kb,
            style=Style.from_dict({"input-field": "fg:yellow"}),
            mouse_support=True,
            full_screen=True,
        )
        self.app.timeoutlen = 0.01
        self.app.ttimeoutlen = 0.01

    # ---- incremental history search ---------------------------------------

    def _history_entries(self) -> list:
        """Oldest-first history entries (the search walks backwards)."""
        try:
            return list(self.input_area.buffer.history.get_strings())
        except Exception:
            return []

    def start_search(self):
        """Enter reverse-i-search: empty query matches the newest entry;
        the input buffer previews the match (ui.rs:380-403)."""
        original = self.input_area.text
        self._search = {"query": "", "original": original,
                        "match_index": None}
        self._search_refresh(start_from=None)

    def search_step(self):
        """Repeated Ctrl-R: continue from one before the current match."""
        s = self._search
        start = None
        if s["match_index"] is not None:
            if s["match_index"] == 0:
                return  # no older entries
            start = s["match_index"] - 1
        self._search_refresh(start_from=start)

    def _search_refresh(self, start_from):
        s = self._search
        hist = self._history_entries()
        idx = find_history_match(hist, s["query"], start_from)
        s["match_index"] = idx
        preview = hist[idx] if idx is not None else s["original"]
        self.input_area.buffer.set_document(
            Document(preview, cursor_position=len(preview)),
            bypass_readonly=True)
        self.info_area.buffer.text = f"reverse-i-search: {s['query']}"
        self.show_info = True
        self.app.invalidate()

    def accept_search(self):
        """Enter: keep the matched text in the input buffer (does NOT
        submit — mirrors ui.rs:540-548)."""
        self._end_search(self.input_area.text)

    def cancel_search(self):
        """Esc: restore the buffer from before the search."""
        self._end_search(self._search["original"])

    def _end_search(self, final_text: str):
        self._search = None
        self.input_area.buffer.set_document(
            Document(final_text, cursor_position=len(final_text)),
            bypass_readonly=True)
        self.info_area.buffer.text = ""
        self.show_info = False
        self.app.invalidate()

    # ---- output scrollback --------------------------------------------------

    def _page_rows(self) -> int:
        info = self.output_window.render_info
        return max(1, info.window_height if info else 10)

    def scroll_output(self, delta_rows: int = 0, home: bool = False,
                      end: bool = False):
        """Move the output view; the cursor-at-end state is the reference's
        auto_scroll flag (write() only follows when the cursor is at the
        bottom — ui.rs:713-760)."""
        buf = self.output_buffer
        doc = buf.document
        if home:
            buf.cursor_position = 0
        elif end:
            buf.cursor_position = len(doc.text)
        else:
            row = doc.cursor_position_row + delta_rows
            row = max(0, min(doc.line_count - 1, row))
            buf.cursor_position = doc.translate_row_col_to_index(row, 0)
            if row >= doc.line_count - 1:
                buf.cursor_position = len(doc.text)  # re-engage follow
        self.app.invalidate()

    # ---- lifecycle -------------------------------------------------------------

    async def start(self):
        if self._app_task is None:
            self._app_task = asyncio.create_task(self.app.run_async())
            await asyncio.sleep(0)

    async def stop(self):
        if self._app_task and not self._app_task.done():
            self.app.exit()
            try:
                await self._app_task
            except Exception:
                pass

    # ---- output ----------------------------------------------------------------

    def _set_output(self, text: str):
        doc = Document(text, cursor_position=len(text))
        self.output_buffer.set_document(doc, bypass_readonly=True)
        self.app.invalidate()

    async def write(self, text: str):
        self.output_text += text
        follow = self.output_buffer.document.is_cursor_at_the_end
        new_text = self.output_buffer.text + text
        cursor = len(new_text) if follow else \
            self.output_buffer.document.cursor_position
        self.output_buffer.set_document(
            Document(new_text, cursor_position=cursor), bypass_readonly=True)
        self.app.invalidate()

    async def clear(self):
        self.output_text = ""
        self.output_buffer.reset()
        self.app.invalidate()

    # ---- input -----------------------------------------------------------------

    async def user_input(self, prompt: str, default: str = "") -> str:
        if "\n" in prompt:
            outline, inline = prompt.rsplit("\n", 1)
        else:
            outline, inline = "", prompt
        self.show_prompt = True
        self.show_info = outline != ""
        self.info_area.buffer.text = outline
        self.prompt_prefix = inline
        if default:
            self.input_area.buffer.insert_text(default)
        self.app.invalidate()
        self._input_future = asyncio.get_event_loop().create_future()
        try:
            result = await self._input_future
        finally:
            self.prompt_prefix = ""
            self.info_area.buffer.text = ""
            self.input_area.buffer.reset()
            self.show_prompt = False
            self.show_info = False
            self._input_future = None
            self.app.invalidate()
        return result

    async def select_index(self, options: list,
                           description: Optional[str] = None) -> int:
        keys = choice_keys(len(options))
        lines = ([description] if description else []) + [
            f"({k}) {option}" for k, option in zip(keys, options)]
        self.info_area.buffer.text = "\n".join(lines)
        self.show_info = True
        self.app.invalidate()

        self._input_future = asyncio.get_event_loop().create_future()
        added = []

        def make_handler(index):
            def handler(event):
                if self._input_future and not self._input_future.done():
                    self._input_future.set_result(index)
            return handler

        for i, key in enumerate(keys):
            self.kb.add(key)(make_handler(i))
            added.append(key)
        try:
            result = await self._input_future
        finally:
            for key in added:
                try:
                    self.kb.remove(key)
                except Exception:
                    pass
            self.info_area.buffer.text = ""
            self.show_info = False
            self._input_future = None
            self.app.invalidate()
        return result
