"""Stream-chain bench variants (VERDICT r2 next #4/#6).

Measures the config-4 streamed samples/s on the real chip for:
  1. the default chain (channelize + power/CFO normalize + frame + classify),
  2. + timing normalization ON (measures its cost -> default-on decision),
  3. + rational 2/3 resampling in front (exercises the whole front-end),
and writes artifacts/bench_r4_stream.json with each variant's rate and its
ratio to the same-run CNN-only rate (the honest overhead figure).

Usage: python scripts/bench_stream_variants.py [backend]
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main(backend: str | None = None) -> None:
    import bench as bench_mod
    from modulationdetectioncnn_tpu.config import AmcConfig, apply_overrides
    from modulationdetectioncnn_tpu.utils.device import warm_transfer_async

    warm_transfer_async().wait(timeout=900)
    cfg = AmcConfig()
    backend = backend or cfg.bench.backend

    # Same-run CNN-only reference rate.
    cnn = bench_mod.run(
        apply_overrides(cfg, ["bench.stream_extra=false"]),
        quiet=True, backend=backend)
    print("cnn-only:", json.dumps(cnn), flush=True)

    # Defaults (config.py StreamConfig): CFO ON, timing OFF — the 'default'
    # row is label-neutral and the explicit _on/_off rows isolate each cost
    # regardless of future default flips (ADVICE r3 #1).
    variants = {
        "default": [],
        "timing_on": ["stream.normalize_timing=true"],
        "resample_2_3": ["stream.resample_up=2", "stream.resample_down=3",
                         "stream.block_len=49152"],
        "cfo_off_timing_off": ["stream.normalize_cfo=false",
                               "stream.normalize_timing=false"],
        # r5 (VERDICT r4 next #3): isolate the CFO cost the r4 artifact put
        # at ~8.6% against config.py's stale "~2%" claim, and measure the
        # half-size spectral search as the cut candidate.
        "cfo_pad2": ["stream.cfo_pad_factor=2"],
        "default_rerun": [],
    }
    out = {"backend": backend, "cnn_only_samples_per_sec": cnn["value"],
           "variants": {}}
    for name, ov in variants.items():
        vcfg = apply_overrides(cfg, ov)
        try:
            res = bench_mod.run_stream_bench(vcfg, quiet=True,
                                             backend=backend)
            out["variants"][name] = {
                "samples_per_sec": res["value"],
                "vs_baseline": res["vs_baseline"],
                "pct_of_cnn_only": round(100 * res["value"] / cnn["value"], 1),
            }
        except Exception as e:  # noqa: BLE001
            out["variants"][name] = {"error": repr(e)[:200]}
        print(name, json.dumps(out["variants"][name]), flush=True)

    path = "/root/repo/artifacts/bench_r5_stream.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
