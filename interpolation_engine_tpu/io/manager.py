"""Input/output manager.

The runtime talks to one :class:`IOManager`, which delegates to a backend:

* :class:`AgentBackend` — the reference's automation protocol
  (reference contract: interpolation_engine.py:46-47, :244-265, :322-356):
  on ``user_input``/``user_choice`` write a JSON payload
  ``{type, output, prompt[, choices]}`` to the agent-output path, then poll
  the agent-input path every 100 ms; choice keys are "1".."9" for ≤9 options
  else "a".."z", and either the key or the exact option text is accepted.
* :class:`BufferBackend` — headless in-memory IO for tests and the batched
  VM's host ring (each parked device instance gets one logical exchange).
* :class:`ScriptedBackend` — canned inputs for differential tests.

The full-screen terminal UI is a separate backend (``io/tui.py``).
"""

from __future__ import annotations

import asyncio
import json
import os
from typing import Optional

from ..core.context import CTX, log


def choice_keys(n_options: int) -> list[str]:
    if n_options <= 9:
        return [str(i) for i in range(1, n_options + 1)]
    return [chr(ord("a") + i) for i in range(n_options)]


class BufferBackend:
    """Collects output; inputs must be pre-seeded or an error is raised."""

    # Batched-ring contract: True promises user_input never truly
    # suspends (completes — or raises — within its first coroutine
    # slice) AND does not depend on output_text being current at
    # user_input time. The turbo engine's vectorized park servicing
    # (vm/turbo.py fast ring) only engages for such backends; backends
    # may additionally define ``user_input_sync(prompt, default="")``
    # to skip coroutine dispatch entirely. File/terminal backends
    # (AgentBackend, LineTerminalBackend) suspend and stay False.
    sync_io = False

    def __init__(self):
        self.output_text = ""

    async def start(self):
        pass

    async def stop(self):
        pass

    async def clear(self):
        self.output_text = ""

    async def write(self, text: str):
        self.output_text += text

    async def user_input(self, prompt: str, default: str = "") -> str:
        raise RuntimeError(
            "BufferBackend received a user_input request; use AgentBackend or "
            "ScriptedBackend for interactive programs.")

    async def select_index(self, options: list, description: Optional[str] = None) -> int:
        raise RuntimeError(
            "BufferBackend received a user_choice request; use AgentBackend or "
            "ScriptedBackend for interactive programs.")


class ScriptedBackend(BufferBackend):
    """Replays a queue of canned responses (test harness)."""

    sync_io = True
    # select_index on an EMPTY list awaits forever with no pre-yield
    # side effect, so a drained race can cancel such a lane entirely on
    # device (vm/turbo.py _fast_cancel). AgentBackend must NOT set this:
    # it publishes the payload file before blocking.
    empty_choice_pure = True

    def __init__(self, responses: Optional[list[str]] = None):
        super().__init__()
        self.responses = list(responses or [])
        self.exchanges: list[dict] = []

    def push(self, *responses: str):
        self.responses.extend(responses)

    def _next(self) -> str:
        if not self.responses:
            raise RuntimeError("ScriptedBackend ran out of canned responses.")
        return self.responses.pop(0)

    def user_input_sync(self, prompt: str, default: str = "") -> str:
        answer = self._next()
        self.exchanges.append(
            {"type": "user_input", "prompt": prompt, "answer": answer})
        return answer

    async def user_input(self, prompt: str, default: str = "") -> str:
        return self.user_input_sync(prompt, default)

    async def select_index(self, options: list, description: Optional[str] = None) -> int:
        if not options:
            # an empty choice list blocks until cancelled (the reference's
            # parallel_race interrupt pattern / out-of-context modal)
            await asyncio.Event().wait()
        raw = self._next()
        keys = choice_keys(len(options))
        choice_map = {k: i for i, k in enumerate(keys)}
        text = raw.strip()
        if text in choice_map:
            index = choice_map[text]
        elif text in options:
            index = options.index(text)
        else:
            raise RuntimeError(
                f"Invalid scripted choice '{raw}'. Expected one of: "
                f"{', '.join(choice_map.keys())}.")
        self.exchanges.append(
            {"type": "user_choice", "options": options, "answer": index})
        return index


class AgentBackend(BufferBackend):
    """File-protocol automation backend."""

    POLL_INTERVAL = 0.1

    def __init__(self, output_path: Optional[str] = None,
                 input_path: Optional[str] = None):
        super().__init__()
        self.output_path = output_path or CTX.agent_output_path
        self.input_path = input_path or CTX.agent_input_path

    def _remove_input(self):
        try:
            os.remove(self.input_path)
        except FileNotFoundError:
            pass

    def _publish(self, payload: dict):
        with open(self.output_path, "w") as f:
            f.write(json.dumps(payload, ensure_ascii=True, indent=2))

    async def _await_input(self) -> str:
        while True:
            if os.path.exists(self.input_path):
                with open(self.input_path, "r") as f:
                    data = f.read()
                self._remove_input()
                return data
            await asyncio.sleep(self.POLL_INTERVAL)

    async def user_input(self, prompt: str, default: str = "") -> str:
        self._remove_input()
        self._publish({
            "type": "user_input",
            "output": self.output_text,
            "prompt": prompt,
        })
        data = await self._await_input()
        return data.rstrip("\n")

    async def select_index(self, options: list, description: Optional[str] = None) -> int:
        keys = choice_keys(len(options))
        choice_map = {k: i for i, k in enumerate(keys)}
        self._remove_input()
        self._publish({
            "type": "user_choice",
            "output": self.output_text,
            "prompt": description,
            "choices": {k: options[i] for k, i in choice_map.items()},
        })
        while True:
            raw = await self._await_input()
            text = raw.strip()
            if text in choice_map:
                return choice_map[text]
            if text in options:
                return options.index(text)
            raise RuntimeError(
                f"Invalid agent choice '{raw}'. Expected one of: "
                f"{', '.join(choice_map.keys())}.")


class LineTerminalBackend(BufferBackend):
    """Minimal line-oriented terminal IO (non-fullscreen fallback).

    On a real terminal it echoes live output and clears the screen; when
    stdout is redirected it stays silent so the final
    ``print(state['output'].strip())`` is the program's only stdout — the
    same observable contract as the reference's full-screen TUI (which runs
    on the alternate screen).
    """

    def __init__(self):
        super().__init__()
        import sys
        self.echo = sys.stdout.isatty()

    async def write(self, text: str):
        self.output_text += text
        if self.echo:
            print(text, end="", flush=True)

    async def clear(self):
        self.output_text = ""
        if self.echo:
            print("\033[2J\033[H", end="", flush=True)

    async def user_input(self, prompt: str, default: str = "") -> str:
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(None, lambda: input(prompt))

    async def select_index(self, options: list, description: Optional[str] = None) -> int:
        keys = choice_keys(len(options))
        lines = ([description] if description else []) + [
            f"({k}) {option}" for k, option in zip(keys, options)]
        print("\n".join(lines), flush=True)
        loop = asyncio.get_running_loop()
        while True:
            raw = await loop.run_in_executor(None, lambda: input("> "))
            text = raw.strip()
            if text in keys:
                return keys.index(text)
            if text in options:
                return options.index(text)
            print(f"Invalid choice '{text}'.", flush=True)


class IOManager:
    """Facade the executor uses; owns one backend instance."""

    def __init__(self, backend=None):
        self.backend = backend or BufferBackend()

    @property
    def output_text(self) -> str:
        return self.backend.output_text

    async def start(self):
        await self.backend.start()

    async def stop(self):
        await self.backend.stop()

    async def clear(self):
        await self.backend.clear()

    async def write(self, text: str):
        await self.backend.write(text)

    async def user_input(self, prompt: str, default: str = "") -> str:
        return await self.backend.user_input(prompt, default)

    async def select_index(self, options: list, description: Optional[str] = None) -> int:
        return await self.backend.select_index(options, description)
