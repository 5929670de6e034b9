"""Full-screen terminal UI backend.

Capability parity with the reference TUIs (reference: the prompt_toolkit app
at interpolation_engine.py:49-416 and the ratatui thread at
rust-project/src/ui.rs:21-1095): a scrolling output pane, a conditional
input area with a multi-line prompt, keyed choice menus (1-9 / a-z), Esc
toggles the runtime menu, Ctrl-D terminates, Ctrl-N inserts a newline in the
input, Up/Down walk persistent input history.

Implemented as an asyncio prompt_toolkit Application (the host runtime is a
single event loop, so no dedicated UI thread is needed — that was a tokio
design constraint, not a requirement).
"""

from __future__ import annotations

import asyncio
from typing import Optional

from prompt_toolkit.application import Application
from prompt_toolkit.buffer import Buffer
from prompt_toolkit.document import Document
from prompt_toolkit.filters import Condition
from prompt_toolkit.history import FileHistory, InMemoryHistory
from prompt_toolkit.key_binding import KeyBindings
from prompt_toolkit.layout import ConditionalContainer, HSplit, Layout, Window
from prompt_toolkit.layout.controls import BufferControl
from prompt_toolkit.styles import Style
from prompt_toolkit.widgets import TextArea

from ..core.context import CTX
from .manager import BufferBackend, choice_keys


class TuiBackend(BufferBackend):
    """Full-screen IO backend; the runtime injects menu/kill callbacks."""

    def __init__(self, on_menu=None, on_kill=None):
        super().__init__()
        self.on_menu = on_menu or (lambda: None)
        self.on_kill = on_kill or (lambda: None)

        history = (FileHistory(CTX.prompt_history_path)
                   if CTX.prompt_history_path else InMemoryHistory())

        self.show_prompt = False
        self.show_info = False
        self.prompt_prefix = ""
        self._input_future: Optional[asyncio.Future] = None
        self._app_task: Optional[asyncio.Task] = None

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

        @kb.add("c-d")
        def _(event):
            self.on_kill()

        @kb.add("escape")
        def _(event):
            self.on_menu()

        @kb.add("c-n")
        def _(event):
            if self.show_prompt:
                self.input_area.buffer.insert_text("\n")

        @kb.add("enter")
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
