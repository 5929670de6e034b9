"""CLI entry point.

Flags mirror the reference CLI (reference: interpolation_engine.py:2407-2456
plus the Rust additions --agent-output/--agent-input, main.rs:18-51):
program path, positional program args (→ ARG{n}), --log, --history,
--inserts-dir, --agent-mode, --agent-output, --agent-input.

Additional TPU-framework flags select the execution engine: --engine host
runs the exact single-instance oracle; --engine device runs the compiled
batched VM on the available accelerator (with host fallback for blocking
ops); --batch replicates the program over N instances for throughput runs.
"""

from __future__ import annotations

import argparse
import asyncio
import os
import sys

from .core.context import CTX
from .core.runtime import async_main
from .io.manager import AgentBackend, IOManager, LineTerminalBackend


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="interpolation-engine-tpu",
        description="Run an interpolation-engine program (TPU-native runtime).",
        allow_abbrev=False,
    )
    parser.add_argument("program", nargs="?", help="Path to the .json5 program file.")
    parser.add_argument(
        "program_arguments", nargs="*",
        help="Positional arguments exposed to the program as {ARG1}, {ARG2}, … "
             "Use '--' before arguments that start with '-'.")
    parser.add_argument("--log", dest="log_path",
                        help="Path to append log/trace output to.")
    parser.add_argument("--history", dest="prompt_history",
                        help="Path to persist input history at.")
    parser.add_argument("--inserts-dir", dest="inserts_dir",
                        help="Directory to resolve insert keys from when absent "
                             "from state['inserts'].")
    parser.add_argument("--agent-mode", action="store_true",
                        help="Serve user_input/user_choice over the agent file "
                             "protocol instead of a terminal.")
    parser.add_argument("--agent-output", default="/tmp/agent_output",
                        help="Agent-mode request file path.")
    parser.add_argument("--agent-input", default="/tmp/agent_input",
                        help="Agent-mode response file path.")
    parser.add_argument("--engine", choices=["host", "device"], default="host",
                        help="host = exact single-instance interpreter; device = "
                             "compiled batched VM on TPU.")
    parser.add_argument("--batch", type=int, default=1,
                        help="Number of program instances (device engine).")
    parser.add_argument("--tui", action="store_true",
                        help="Use the full-screen terminal UI.")
    parser.add_argument("--analyze", action="store_true",
                        help="Print extended static-analysis diagnostics and "
                             "exit without running.")
    parser.add_argument("--audio-web", action="store_true",
                        help="Serve TTS audio over HTTP instead of pw-play.")
    parser.add_argument("--audio-port", type=int, default=8765,
                        help="Port for --audio-web.")
    parser.add_argument("--log-json", dest="log_json_path",
                        help="Also write structured JSON-lines events here.")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    CTX.log_sink = open(args.log_path, "a") if args.log_path else open(os.devnull, "w")
    CTX.prompt_history_path = args.prompt_history
    CTX.agent_mode = args.agent_mode
    CTX.agent_output_path = args.agent_output
    CTX.agent_input_path = args.agent_input

    if not args.program:
        print("Error: specify a program (.json5 file) to run.")
        return 1
    if args.inserts_dir:
        if not os.path.isdir(args.inserts_dir):
            print(f"Error: --inserts-dir must be an existing directory, got "
                  f"'{args.inserts_dir}'.")
            return 1
        CTX.inserts_dir = args.inserts_dir

    if args.log_json_path:
        from .core.events import EVENTS
        EVENTS.json_sink = open(args.log_json_path, "a")

    if args.analyze:
        from .programs.analyzer import analyze_program
        from .programs.loader import load
        CTX.program_dir = os.path.dirname(os.path.abspath(args.program))
        program, _ = load(args.program)
        diagnostics = analyze_program(program)
        for diag in diagnostics:
            print(diag)
        print(f"{len(diagnostics)} diagnostic(s).")
        return 0 if not diagnostics else 2

    if args.agent_mode:
        backend = AgentBackend(args.agent_output, args.agent_input)
    elif args.tui and sys.stdout.isatty():
        from .io.tui import TuiBackend
        backend = TuiBackend()
    else:
        backend = LineTerminalBackend()
    io = IOManager(backend)

    if args.engine == "device":
        from .vm.driver import run_program_on_device
        return run_program_on_device(
            args.program, args.program_arguments, io, batch=args.batch)

    asyncio.run(async_main(args.program, args.program_arguments, io))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
