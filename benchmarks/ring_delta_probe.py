"""Micro-probe: host-ring write-back cost, full re-encode vs delta.

The ring services each parked row with decode → execute_task → write-back.
This times the write-back half on a realistic adventure-shaped row (64-ish
slots, lists, long strings) for the common park (ONE slot changed, output
unchanged). Run: python benchmarks/ring_delta_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from bench import adventure_program
from interpolation_engine_tpu import json5
from interpolation_engine_tpu.compiler import compile_program
from interpolation_engine_tpu.programs.loader import add_line_numbers
from interpolation_engine_tpu.programs.validator import validate_program
from interpolation_engine_tpu.vm.turbo import TurboConfig, TurboEngine


def main():
    src = adventure_program(6, t_max=1 << 30)
    program = json5.loads(add_line_numbers(src))
    validate_program(program)
    compiled = compile_program(program)
    tcfg = TurboConfig(tile=8, width=128, out_width=128, k_steps=8)
    eng = TurboEngine(compiled, tcfg)

    inserts = dict(compiled.program["default_state"]["inserts"])
    inserts.update({"scene": "scene-3-41", "gen": "gen-scene-3-41",
                    "hlen": 7, "choice": "c3", "turn": 41, "acc": 93,
                    "hist": [f"h3.{t}" for t in range(34, 41)]})
    row = eng._encode_row(inserts, "gen-scene-3-41;", 5, 500)
    sub = {"regs": row["regs"][None].copy(),
           "sbuf": row["sbuf"][:, None, :].copy(),
           "out": row["out"][None].copy()}

    n = 3000
    state = eng._decode_row(sub, 0, None)

    # common park: ONE slot changed (user_input answer), output unchanged
    t0 = time.perf_counter()
    for k in range(n):
        st = dict(state, inserts=dict(state["inserts"], choice=f"c{k % 7}"))
        eng._write_row(sub, 0, st, 6, 501)
    full_s = time.perf_counter() - t0

    before = eng._snapshot_inserts(state["inserts"])
    t0 = time.perf_counter()
    for k in range(n):
        st = dict(state, inserts=dict(state["inserts"], choice=f"c{k % 7}"))
        eng._write_row_delta(sub, 0, before, state["output"], st, 6, 501)
    delta_s = time.perf_counter() - t0

    # decode cost for scale
    t0 = time.perf_counter()
    for _ in range(n):
        eng._decode_row(sub, 0, None)
    dec_s = time.perf_counter() - t0

    print(f"rows={n} slots={eng.plan.n_slots} sbuf_rows={eng.cols.n_rows}")
    print(f"full  write: {full_s / n * 1e6:8.1f} us/row")
    print(f"delta write: {delta_s / n * 1e6:8.1f} us/row  "
          f"({full_s / delta_s:.1f}x)")
    print(f"decode     : {dec_s / n * 1e6:8.1f} us/row")


if __name__ == "__main__":
    main()
