"""Incremental stream filters for chat output.

Behavioral contract (reference: src/interpolation_engine/filter.py:2-89):

* :class:`OutputFilter` extracts ``start_str…stop_str`` spans from a token
  stream, optionally enumerating multiple outputs ("1. ", "\\n\\n2. ", …),
  holding back any buffer suffix that could be a prefix of the next
  delimiter so delimiters split across chunks are recognized.
* :class:`InvertedFilter` hides ``start_str…stop_str`` spans (e.g.
  ``<think>…</think>``) with the same hold-back logic.
* An empty delimiter disables filtering: everything passes through and
  accumulates into a single output.

The hold-back state machines here are the exact oracle for the device VM's
vectorized filter kernels.
"""

from __future__ import annotations


def _holdback_point(buffer: str, next_str: str) -> int:
    """Index below which the buffer can never contain a prefix of next_str."""
    if next_str == "":
        return len(buffer)
    for i in range(len(buffer)):
        if next_str.startswith(buffer[i:i + len(next_str)]):
            return i
    return len(buffer)


class OutputFilter:
    """Extract delimited spans; feed chunks via __call__, read .outputs."""

    def __init__(self, start_str: str, stop_str: str, enumerate_outputs: bool = False):
        self.start_str = start_str
        self.stop_str = stop_str
        self.enumerate_outputs = enumerate_outputs
        self.passthrough = start_str == "" or stop_str == ""
        self.shown = False
        self.buffer = ""
        self.outputs: list[str] = []

    def __call__(self, chunk: str) -> str:
        if self.passthrough:
            if not self.outputs:
                self.outputs.append("")
            self.outputs[-1] += chunk
            return chunk

        self.buffer += chunk
        # next_str is computed ONCE per update; after an in-call toggle the
        # hold-back below still scans against the pre-toggle delimiter —
        # deliberate fidelity with the reference state machine.
        next_str = self.stop_str if self.shown else self.start_str

        enumeration = ""
        if next_str and self.buffer.startswith(next_str):
            self.buffer = self.buffer[len(next_str):]
            self.shown = not self.shown
            if self.shown:
                self.outputs.append("")
                if self.enumerate_outputs:
                    enumeration = "\n\n" * (len(self.outputs) > 1) + f"{len(self.outputs)}. "

        safe = _holdback_point(self.buffer, next_str)
        delta = self.buffer[:safe] if self.shown else ""
        self.buffer = self.buffer[safe:]
        if self.shown:
            self.outputs[-1] += delta
        return enumeration + delta


class InvertedFilter:
    """Hide delimited spans (e.g. <think>…</think>) from a stream."""

    def __init__(self, start_str: str, stop_str: str):
        self.start_str = start_str
        self.stop_str = stop_str
        self.shown = True
        self.buffer = ""

    def __call__(self, chunk: str) -> str:
        self.buffer += chunk
        next_str = self.start_str if self.shown else self.stop_str

        if next_str and self.buffer.startswith(next_str):
            self.buffer = self.buffer[len(next_str):]
            self.shown = not self.shown

        safe = _holdback_point(self.buffer, next_str)
        delta = self.buffer[:safe] if self.shown else ""
        self.buffer = self.buffer[safe:]
        return delta
