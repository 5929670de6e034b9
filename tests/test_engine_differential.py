"""Randomized program generator: device engine vs host engine must agree.

Generates small random programs from the device-supported opcode mix and
compares final output and insert stores between the compiled batched VM and
the exact host interpreter.
"""

import asyncio
import random
import string

import pytest

from interpolation_engine_tpu import json5
from interpolation_engine_tpu.compiler import compile_program
from interpolation_engine_tpu.core.runtime import async_main
from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend
from interpolation_engine_tpu.programs.loader import add_line_numbers
from interpolation_engine_tpu.programs.validator import (
    ProgramValidationError,
    validate_program,
)
from interpolation_engine_tpu.vm.config import DONE, VMConfig
from interpolation_engine_tpu.vm.driver import DeviceRunner

from test_device_vm import CFG


def gen_program(rng: random.Random):
    """A random straight-line-plus-jumps program over device opcodes."""
    keys = ["k1", "k2", "k3"]
    lists = {"la": ["x", "y", "z"], "lb": ["1", "2"]}
    inserts = {"k1": rng.choice(["hello", 7, "a b"]),
               "la": lists["la"], "lb": lists["lb"]}
    tasks = []
    n_labels = 0

    def rand_text():
        parts = []
        for _ in range(rng.randint(0, 3)):
            if rng.random() < 0.6:
                parts.append(rng.choice(["t ", "x", "=", "z"]))
            else:
                parts.append("{" + rng.choice(keys + ["la"]) + "}")
        return "".join(parts)

    for i in range(rng.randint(2, 8)):
        kind = rng.choice(["print", "set", "math", "join", "append", "index",
                           "slice", "replace", "delete", "label_goto",
                           "parallel"])
        if kind == "print":
            tasks.append({"cmd": "print", "text": rand_text()})
        elif kind == "set":
            value = rng.choice([rand_text(), str(rng.randint(-5, 50)),
                                ["p", "q"], "{la}"])
            tasks.append({"cmd": "set", "item": value,
                          "output_name": rng.choice(keys)})
        elif kind == "math":
            expr = rng.choice([
                "1 + 2 * 3", "length(la) * 4", "max(1,5,3) - min(2,9)",
                "(7 % 3) + length(lb)", "sign(5-9)",
            ])
            tasks.append({"cmd": "math", "input": expr,
                          "output_name": rng.choice(keys)})
        elif kind == "join":
            tasks.append({"cmd": "list_join", "list": "{la}",
                          "before": rng.choice(["", "<"]), "between": "|",
                          "after": "", "output_name": rng.choice(keys)})
        elif kind == "append":
            tasks.append({"cmd": "list_append", "list": "{la}",
                          "item": rng.choice(["w", "9"]),
                          "output_name": "la"})
        elif kind == "index":
            tasks.append({"cmd": "list_index", "list": "{la}",
                          "index": rng.choice([1, 2, -1]),
                          "output_name": rng.choice(keys)})
        elif kind == "slice":
            tasks.append({"cmd": "list_slice", "list": "{la}",
                          "from_index": rng.choice([1, 2]),
                          "to_index": rng.choice([2, 3, -1, 99]),
                          "output_name": "lb"})
        elif kind == "replace":
            tasks.append({"cmd": "replace_map", "item": "{k1}",
                          "output_name": rng.choice(keys),
                          "wildcard_maps": [
                              {"hello": "greets"},
                              {"* *": "[{1}]({2})"},
                              {"NULL": "(none)"},
                              {"*": "<{1}>"},
                          ]})
        elif kind == "delete":
            tasks.append({"cmd": "delete",
                          "wildcards": [rng.choice(["k2", "k3", "lb"])]})
        elif kind == "parallel":
            # compute-only subtasks: with no awaits, asyncio runs the
            # gathered lanes to completion in order — the device thread
            # lanes must match byte-for-byte. Lane bodies only reference
            # keys that definitely exist: when one racing lane raises
            # while another completes in the same slice burst, the
            # REFERENCE itself is nondeterministic (done.pop() from a
            # set, interpolation_engine.py:1603-1623) — nothing to
            # differential-test there.
            cmd = rng.choice(["parallel_wait", "parallel_race"])

            def safe_text():
                # literal-only: printing an int/list-valued key raises in
                # the reference, which re-opens the burst nondeterminism
                return "".join(rng.choices(["t ", "x", "=", "z", "| "],
                                           k=rng.randint(0, 4)))

            subtasks = []
            for lane in range(rng.randint(1, 3)):
                body = [{"cmd": "print", "text": safe_text()}]
                if rng.random() < 0.6:
                    written = rng.choice(keys)
                    body.append({"cmd": "set", "item": safe_text(),
                                 "output_name": written})
                    if rng.random() < 0.5:
                        body.append({"cmd": "print",
                                     "text": "{" + written + "}"})
                subtasks.append({"cmd": "serial", "tasks": body})
            tasks.append({"cmd": cmd, "tasks": subtasks})
        elif kind == "label_goto":
            name = f"@L{n_labels}"
            n_labels += 1
            # forward goto over a print
            tasks.append({"cmd": "goto", "name": name})
            tasks.append({"cmd": "print", "text": "SKIPPED"})
            tasks.append({"cmd": "label", "name": name})

    return {
        "default_state": {"order_index": 1, "inserts": inserts},
        "order": tasks,
        "named_tasks": {},
        "save_states": {},
    }


def run_host_program(program_src: str, tmp_path, idx: int):
    path = tmp_path / f"p{idx}.json5"
    path.write_text(program_src)
    io = IOManager(ScriptedBackend())
    try:
        state = asyncio.run(async_main(str(path), [], io))
        return ("ok", state["output"], dict(state["inserts"]))
    except Exception as e:
        return ("error", type(e).__name__)


def run_device_program(program_src: str):
    program = json5.loads(add_line_numbers(program_src))
    try:
        validate_program(program)
    except ProgramValidationError:
        return ("invalid",)
    compiled = compile_program(program)
    if compiled.host_only:
        return ("host_only",)
    runner = DeviceRunner(compiled, CFG)
    batch = runner.make_instances(1)
    try:
        final = runner.run(batch, inner_steps=32, max_rounds=300)
    except Exception as e:
        return ("error", type(e).__name__)
    r = runner.results(final)[0]
    if r.status != DONE:
        return ("stuck", r.status)
    return ("ok", r.output, r.inserts)


@pytest.mark.slow
def test_random_programs_agree(tmp_path, capsys):
    rng = random.Random(20260816)
    n_compared = 0
    for idx in range(40):
        program = gen_program(rng)
        src = json5.dumps(program, indent=2)
        numbered_ok = True
        try:
            validate_program(json5.loads(add_line_numbers(src)))
        except Exception:
            continue  # generator produced an invalid program; skip
        host = run_host_program(src, tmp_path, idx)
        dev = run_device_program(src)
        if dev[0] in ("invalid", "host_only"):
            continue
        if host[0] == "error":
            # device must also fail (ring re-raises the same host error)
            assert dev[0] in ("error", "stuck"), (src, host, dev)
            continue
        assert dev[0] == "ok", (src, dev, host)
        assert dev[1] == host[1], f"output mismatch\n{src}\n{dev}\n{host}"
        assert dev[2] == host[2], f"inserts mismatch\n{src}\n{dev}\n{host}"
        n_compared += 1
    capsys.readouterr()
    assert n_compared >= 25, n_compared
