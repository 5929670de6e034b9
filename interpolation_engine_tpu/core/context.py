"""Process-wide runtime context.

The reference keeps these as module globals (reference:
src/interpolation_engine/interpolation_engine.py:41-47, :2438-2451); we keep
them on one mutable context object so the batched VM can run many logical
"processes" with distinct contexts if needed.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, TextIO


INSERT_START = "{"
INSERT_STOP = "}"
ESCAPE = "\\"

# Private sentinels used to protect escaped braces during interpolation
# (reference behavior: interpolation_engine.py:500-508).
SENTINEL_START = ".〠"
SENTINEL_STOP = "〠."


@dataclass
class RuntimeContext:
    inserts_dir: Optional[str] = None
    program_dir: Optional[str] = None
    log_sink: TextIO = field(default_factory=lambda: open(os.devnull, "w"))
    agent_output_path: str = "/tmp/agent_output"
    agent_input_path: str = "/tmp/agent_input"
    agent_mode: bool = False
    prompt_history_path: Optional[str] = None


# Default process context; the CLI mutates this, tests build their own.
CTX = RuntimeContext()


def log_enabled() -> bool:
    """False when the sink is the default os.devnull (no --log): hot call
    sites guard expensive preview formatting on this."""
    return getattr(CTX.log_sink, "name", None) != os.devnull


def log(msg: str, flush: bool = False):
    if not log_enabled():  # no --log: skip the devnull write
        return
    print(msg, file=CTX.log_sink, flush=flush)
