"""The REAL flagship at scale on hardware (VERDICT r4 next #3): N (default
10,240) instances of the actual /root/reference/examples/text_adventure.json5
— not the adventure-*shaped* bench spine — on the turbo engine against the
fake SSE server, with per-instance scripted agent inputs, driving two full
turns (scenario → opening chat → action → response chat → world query).
Reports turns/sec, chat calls, park/fast-ring telemetry, and asserts ZERO
general-engine migrations and zero per-instance host retirement. Slot
PROMOTION is expected and counted, not forbidden: at the default base
width 128 every instance's first chat write-back (the scenario paragraph,
reference text_adventure.json5:253-258 analogue) overflows and promotes
into the 4x-wider turbo sibling — exactly the "promotion under load"
path VERDICT r4 next #3 asks to exercise. At IE_FLAGSHIP_WIDTH=512 (the
chat-realistic width, VERDICT r4 next #2 envelope) nothing overflows and
promotions must be ZERO.

Env: IE_FLAGSHIP_N (instances, default 10240), IE_FLAGSHIP_LEAF (dispatch
leaf, default 4 — the flagship is IO/chat-bound; leaf=4 compiles in ~4 min
where leaf=32 needs ~40, and the kernel is not the bottleneck here),
IE_FLAGSHIP_WIDTH (base slot width, default 128; 512 = chat-realistic),
IE_FLAGSHIP_TIMEOUT_S (default 5400).

Writes benchmarks/r05_runs/flagship.json on success.
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

from interpolation_engine_tpu.compiler import compile_program
from interpolation_engine_tpu.io.manager import IOManager
from interpolation_engine_tpu.programs.loader import invalidate_cache, load
from interpolation_engine_tpu.vm.turbo import TurboConfig, TurboEngine

from fake_sse_server import FakeSSEServer
from test_text_adventure import BlockingScriptedBackend, make_adventure_program
from test_device_text_adventure import responder


def main():
    n = int(os.environ.get("IE_FLAGSHIP_N", 10240))
    leaf = int(os.environ.get("IE_FLAGSHIP_LEAF", 4))
    width = int(os.environ.get("IE_FLAGSHIP_WIDTH", 128))
    timeout_s = float(os.environ.get("IE_FLAGSHIP_TIMEOUT_S", 5400))
    counter = {"n": 0}

    # promotion accounting: slot-overflow promotion into the 4x-wider
    # turbo SIBLING is the designed path for chat-sized write-backs at
    # base width 128 (vm/turbo.py _flush_promotions) and is expected
    # here; falling to the GENERAL engine is the migration that must
    # never happen (VERDICT r4 next #3: "migrations (must be 0)").
    promoted = {"n": 0, "width": 0}
    orig_promo = TurboEngine._flush_promotions
    orig_esc = TurboEngine._flush_escapes

    async def counting_promo(self):
        if self._promote_states:
            promoted["n"] += len(self._promote_states)
            promoted["width"] = self.tcfg.width * self.promote_factor
        return await orig_promo(self)

    async def guarded_escape(self):
        assert not self._escape_states, (
            f"instances migrated to the GENERAL engine: "
            f"{sorted(self._escape_states)[:8]}...")
        return await orig_esc(self)

    TurboEngine._flush_promotions = counting_promo
    TurboEngine._flush_escapes = guarded_escape

    def counting_responder(body):
        counter["n"] += 1
        return responder(body)

    backends = {}

    def backend_for(i):
        b = backends.get(i)
        if b is None:
            b = backends[i] = BlockingScriptedBackend([
                "A lonely arctic outpost.",
                "open the door",
                "(what year is it)",
            ])
        return b

    rec = {}

    async def go():
        tmp = tempfile.mkdtemp()
        async with FakeSSEServer(counting_responder, chunk_size=64) as server:
            path = make_adventure_program(Path(tmp), server.url)
            invalidate_cache()
            program, _ = load(path)
            compiled = compile_program(program)
            assert not compiled.host_only

            # width=512's config mirrors the width-128 run's promotion
            # SIBLING exactly (tile/4, widths*4 — _flush_promotions), so
            # a warm sibling executable from a prior base-128 run is a
            # cache hit for the wide base run too.
            f = width // 128
            tcfg = TurboConfig(tile=max(8, min(512, n) // f), width=width,
                               out_width=256 * f, elem_width=32 * f,
                               k_steps=16, leaf=leaf)
            engine = TurboEngine(
                compiled, tcfg,
                io_factory=lambda i: IOManager(backend_for(i)))
            print(f"platform={jax.devices()[0].platform} n={n} "
                  f"leaf={leaf} width={width} "
                  f"interpret={engine.interpret}", flush=True)
            t0 = time.perf_counter()
            batch = engine.make_batch(n)
            step = engine.step_fn(batch.regs.shape[0])
            batch = step(batch)
            jax.block_until_ready(batch.regs)
            compile_s = time.perf_counter() - t0
            print(f"first step (compile) = {compile_s:.1f}s", flush=True)

            t0 = time.perf_counter()
            task = asyncio.create_task(
                engine.run_async(batch, max_rounds=10_000_000))
            target_chats = 3 * n
            done_at = None
            while time.perf_counter() - t0 < timeout_s:
                await asyncio.sleep(1.0)
                left = sum(len(b.responses) for b in backends.values())
                el = time.perf_counter() - t0
                if int(el) % 30 < 1:
                    rs = engine.ring_stats
                    print(f"  t={el:6.0f}s chats={counter['n']}/"
                          f"{target_chats} responses_left={left} "
                          f"parks={rs['parks']} fast={rs['fast_parks']} "
                          f"escapes={rs['escapes']}", flush=True)
                if counter["n"] >= target_chats and left == 0 and \
                        len(backends) >= n:
                    done_at = time.perf_counter() - t0
                    break
            # let in-flight final-turn writes land, then stop
            await asyncio.sleep(2.0)
            task.cancel()
            try:
                await task
            except asyncio.CancelledError:
                pass
            for t in engine._promo_tasks:
                t.cancel()
            assert done_at is not None, (
                f"timed out: chats={counter['n']}/{target_chats}")

            # zero general-engine migrations; promotion stays on turbo
            assert not engine._promote_states, "unflushed promotion queue"
            assert not engine._escape_states, "instances escaped to general"
            assert not engine._host_results, "per-instance host retirement"
            if width >= 512:
                assert promoted["n"] == 0, (
                    f"chat write-backs overflowed {width}B slots: "
                    f"{promoted}")

            rs = engine.ring_stats
            turns = 2 * n
            rec.update(
                test="hw_flagship",
                program="reference text_adventure.json5",
                platform=jax.devices()[0].platform, n=n, leaf=leaf,
                base_width=width,
                compile_s=round(compile_s, 1),
                elapsed_s=round(done_at, 1),
                turns=turns,
                turns_per_sec=round(turns / done_at, 1),
                chat_calls=counter["n"],
                chats_per_sec=round(counter["n"] / done_at, 1),
                parks=rs["parks"], fast_parks=rs["fast_parks"],
                rounds=rs["rounds"],
                promotions=promoted["n"],
                promoted_width=promoted["width"],
                general_migrations=0,
            )

            # spot-check 16 transcripts for the exact two-turn flow
            import random
            for i in random.sample(sorted(backends), min(16, len(backends))):
                text = backends[i].output_text
                assert "You wake in a cold cabin." in text, (i, text)
                assert "> open the door" in text, (i, text)
                assert "? (what year is it)" in text, (i, text)
                assert "<action>" not in text, (i, text)

    asyncio.run(go())
    outdir = Path(__file__).parent / "r05_runs"
    outdir.mkdir(exist_ok=True)
    name = "flagship.json" if width == 128 else f"flagship_w{width}.json"
    (outdir / name).write_text(json.dumps(rec))
    print("FLAGSHIP OK", json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
