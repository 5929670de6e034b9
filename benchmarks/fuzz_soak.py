"""One-off differential soak: N random turbo-eligible programs (incl.
blocking user_input, lists, parallel blocks) host vs turbo engine.

Usage: python benchmarks/fuzz_soak.py [count] [seed]
Exits non-zero on the first divergence, printing the program source.
"""

import asyncio
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from interpolation_engine_tpu import json5
from interpolation_engine_tpu.compiler import compile_program
from interpolation_engine_tpu.compiler.turbo import NotTurbo, plan_turbo
from interpolation_engine_tpu.core.runtime import async_main
from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend
from interpolation_engine_tpu.programs.loader import add_line_numbers
from interpolation_engine_tpu.programs.validator import (
    ProgramValidationError, validate_program)
from interpolation_engine_tpu.vm.config import DONE

import test_turbo  # noqa: E402
from test_turbo import gen_turbo_program, run_turbo  # noqa: E402

# SOAK_WIDTH/SOAK_ELEM/SOAK_OUT/SOAK_LIST_CAP override the default turbo
# config — a width >128 run drives every instruction through _taa's
# multi-chunk gather decomposition (the Mosaic 128-lane workaround),
# differentially against the host oracle.
if any(k in os.environ for k in ("SOAK_WIDTH", "SOAK_ELEM", "SOAK_OUT",
                                 "SOAK_LIST_CAP")):
    from interpolation_engine_tpu.vm.turbo import TurboConfig
    test_turbo.TCFG = TurboConfig(
        tile=8,
        width=int(os.environ.get("SOAK_WIDTH", 64)),
        out_width=int(os.environ.get("SOAK_OUT", 192)),
        k_steps=24,
        list_cap=int(os.environ.get("SOAK_LIST_CAP", 12)),
        elem_width=int(os.environ.get("SOAK_ELEM", 32)))

# ×6: in-lane user_input (round 4) can consume several responses per
# parallel block on top of the top-level IO
RESPONSES = ["ada", "1", "x y", "beta", "{brace", "2", "tail",
             "3", "gm", "plain", "7", "z}"] * 6


def main():
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 99
    rng = random.Random(seed)
    import tempfile
    compared = skipped = errors_matched = 0
    for idx in range(count):
        program = gen_turbo_program(rng)
        src = json5.dumps(program, indent=2)
        try:
            parsed = json5.loads(add_line_numbers(src))
            validate_program(parsed)
            compiled = compile_program(parsed)
            plan_turbo(compiled)
        except (ProgramValidationError, NotTurbo):
            skipped += 1
            continue
        with tempfile.NamedTemporaryFile(
                "w", suffix=".json5", delete=False) as f:
            f.write(src)
            path = f.name
        io = IOManager(ScriptedBackend(list(RESPONSES)))
        try:
            state = asyncio.run(async_main(path, [], io))
            host = ("ok", state["output"], dict(state["inserts"]))
        except Exception as e:
            host = ("error", type(e).__name__)
        try:
            results = run_turbo(src, n=2, responses=RESPONSES)
            dev = ("ok", results)
        except Exception as e:
            dev = ("error", type(e).__name__)
        if host[0] == "error":
            assert dev[0] == "error" and dev[1] == host[1], \
                f"DIVERGENCE (error class) at #{idx}\n{src}\n{host}\n{dev}"
            errors_matched += 1
            os.unlink(path)
            continue
        assert dev[0] == "ok", f"DIVERGENCE at #{idx}\n{src}\n{dev}"
        for r in dev[1]:
            assert r.status == DONE and r.output == host[1] \
                and r.inserts == host[2], \
                f"DIVERGENCE at #{idx}\n{src}\n{r}\nwant {host}"
        compared += 1
        os.unlink(path)
        if (idx + 1) % 20 == 0:
            print(f"  {idx + 1}/{count}: compared={compared} "
                  f"errors_matched={errors_matched} skipped={skipped}",
                  flush=True)
    print(f"SOAK OK: compared={compared} errors_matched={errors_matched} "
          f"skipped={skipped} of {count}")


if __name__ == "__main__":
    main()
