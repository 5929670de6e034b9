"""Hardware promotion proof (VERDICT r4 next #2): a chat-sized (400 B)
write-back that overflows the 128-byte base slot width must PROMOTE into
the 4x-wider sibling batch — a width-512 Mosaic kernel, exactly the shape
that failed to compile in round 4 (benchmarks/r04_runs/adventure_real2.err,
root-caused to the affine-folded-gather bug; fixed by _shift_static) — and
STEP it on the real TPU, with byte-exact host parity and zero general-engine
escapes. 400 B (not the CPU test's 600 B) because the sibling of width 128
is 512 bytes: the value must fit the sibling to stay on turbo.

Writes benchmarks/r05_runs/promotion.json on success.
"""

import asyncio
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend
from interpolation_engine_tpu.vm.turbo import TurboConfig, TurboEngine

from test_device_vm import compile_src, run_host

SRC = """
{
    default_state: {order_index: 1, inserts: {pre: 'p'}},
    order: [
        {cmd:'set', item:'{pre}-x', output_name:'tag'},
        {cmd:'user_input', prompt:'say? ', output_name:'big'},
        {cmd:'set', item:'tail:{tag}', output_name:'t2'},
        {cmd:'print', text:'len done {t2};'},
    ],
    named_tasks: {}, save_states: {},
}
"""


def main():
    big = "B" * 400
    platform = jax.devices()[0].platform
    print(f"platform={platform}", flush=True)
    host = run_host(SRC, Path(tempfile.mkdtemp()), responses=[big])
    compiled = compile_src(SRC)

    # guard: the run must never fall through to the general engine
    orig_esc = TurboEngine._flush_escapes

    async def guarded(self):
        assert not self._escape_states, (
            f"instances fell to the GENERAL engine: "
            f"{sorted(self._escape_states)}")
        return await orig_esc(self)

    TurboEngine._flush_escapes = guarded

    sibling_cfg = {}
    orig_promo = TurboEngine._flush_promotions

    async def recording(self):
        if self._promote_states:
            f = self.promote_factor
            sibling_cfg.update(
                width=self.tcfg.width * f, tile=max(8, self.tcfg.tile // f),
                n=len(self._promote_states))
        return await orig_promo(self)

    TurboEngine._flush_promotions = recording

    n = 8
    tcfg = TurboConfig(tile=8, width=128, out_width=128, k_steps=24)
    engine = TurboEngine(
        compiled, tcfg,
        io_factory=lambda i: IOManager(ScriptedBackend([big])))
    t0 = time.perf_counter()
    batch = engine.run(engine.make_batch(n), max_rounds=300)
    elapsed = time.perf_counter() - t0
    results = engine.results(batch)

    assert sibling_cfg, "no promotion happened (write-back fit base width?)"
    assert sibling_cfg["width"] == 512, sibling_cfg
    assert not engine._host_results, "per-instance host retirement occurred"
    assert len(engine._escape_results) == n, engine._escape_results
    for r in results:
        assert r.status == 1, r                      # DONE (vm/config.py:66)
        assert r.output == host["output"], (r.output, host["output"])
        assert r.inserts == dict(host["inserts"])

    rec = {
        "test": "hw_promotion", "platform": platform, "n": n,
        "base_width": 128, "sibling_width": sibling_cfg["width"],
        "promoted": sibling_cfg["n"], "general_escapes": 0,
        "elapsed_s": round(elapsed, 1), "parity": "byte-exact",
    }
    outdir = Path(__file__).parent / "r05_runs"
    outdir.mkdir(exist_ok=True)
    (outdir / "promotion.json").write_text(json.dumps(rec))
    print("PROMOTION OK", json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
