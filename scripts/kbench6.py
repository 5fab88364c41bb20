"""Layout-redesign probes for the fused int8 conv stage (kbench5 successor).

Hypotheses under test (from kbench5 results: int8 dot ceiling ~1093 TOPS,
conv stage only 51 TOPS, 63 TOPS even with requant stripped):
  H1. The 80-lane tap slices in _shift_add (0:80, 80:160, 160:240) force
      lane-crossing relayouts -> pad each tap's c2 block to 128 lanes.
  H2. conv1's K=8 matmul wastes MXU (K pads to 128).
  H3. The fp32 requantize VPU pass is secondary at these rates.

Probes (all chained in-program, two-length differencing):
  ceil      int8 + bf16 dot ceilings at 2048^3
  conv2only the dominant matmul alone, current 240-lane layout
  padN      taps-on-N with 128-lane padding per tap (H1)
  tapK      taps-on-K: 3 sublane-offset dots accumulated, N=128 (H1 alt)
  rq        isolated requantize pass over the conv1 activation
Usage: python scripts/kbench6.py [probe ...]
"""
from __future__ import annotations

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modulationdetectioncnn_tpu.ops.cnn_kernels import requantize
from modulationdetectioncnn_tpu.utils.timing import measure_per_iter_chained

rng = np.random.default_rng(0)
batch = 4096
t_in, c2 = 128, 80
t1, t2 = t_in - 2, t_in - 4


def report(name, sec, work, unit="TOPS"):
    rate = work / sec / 1e12
    us_per_frame = sec / batch * 1e9
    print(f"{name:44s} {sec*1e6:9.1f} us  {rate:7.2f} {unit}"
          f"  {us_per_frame:7.1f} ns/frame", flush=True)


probes = sys.argv[1:] or ["ceil", "conv2only", "padN", "tapK", "rq"]

if "ceil" in probes:
    for dt, acc, mask in [
        (jnp.int8, jnp.int32, lambda y: (y & 127).astype(jnp.int8)),
        (jnp.bfloat16, jnp.float32,
         lambda y: (y * 1e-3).astype(jnp.bfloat16)),
    ]:
        a0 = jnp.asarray(rng.integers(-100, 100, (2048, 2048))).astype(dt)
        b0 = jnp.asarray(rng.integers(-100, 100, (2048, 2048))).astype(dt)

        def body(c, b0=b0, acc=acc, mask=mask):
            y = jax.lax.dot_general(c, b0, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc)
            return mask(y)

        sec = measure_per_iter_chained(body, a0, n1=50, n2=250)
        print(f"{dt.__name__} dot 2048^3 ceiling: "
              f"{2 * 2048**3 / sec / 1e12:.1f} T{'OP' if dt==jnp.int8 else 'FLOP'}/s",
              flush=True)

BB, CH = 64, 16


def run_conv(kernel, consts, name, slots, out_lanes=c2, in_lanes=512,
             BB=BB):
    a1_full = jnp.asarray(
        rng.integers(0, 127, (batch * t1, in_lanes)).astype(np.int8))
    cj = [jnp.asarray(c) for c in consts]

    def body(carry):
        out = pl.pallas_call(
            functools.partial(kernel, chunk=CH),
            grid=(batch // BB,),
            in_specs=[pl.BlockSpec((BB * t1, in_lanes), lambda i: (i, 0))]
            + [pl.BlockSpec(c.shape, (lambda i: (0,)) if c.ndim == 1
                            else (lambda i: (0, 0))) for c in cj],
            out_specs=pl.BlockSpec((BB, t2, out_lanes), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((batch, t2, out_lanes), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(carry, *cj)
        flat = out.reshape(-1)
        need = batch * t1 * in_lanes
        reps = -(-need // flat.shape[0])
        return jnp.tile(flat, reps)[:need].reshape(batch * t1, in_lanes)

    sec = measure_per_iter_chained(body, a1_full, n1=4, n2=20)
    report(name, sec, 2 * batch * slots)


if "conv2only" in probes:
    w2 = rng.integers(-100, 100, (512, 240)).astype(np.int8)

    def k_conv2(a_ref, w_ref, o_ref, *, chunk):
        tb = o_ref.shape[0]
        for ci in range(tb // chunk):
            a1 = a_ref[ci * chunk * t1 : (ci + 1) * chunk * t1]
            z = jax.lax.dot_general(
                a1, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t1, 240)
            o_ref[ci * chunk : (ci + 1) * chunk] = (
                z[:, :t2, :c2] >> 9).astype(jnp.int8)

    run_conv(k_conv2, [w2], "conv2 mm only (240 lanes, no shiftadd)",
             t1 * 512 * 256)

    def k_conv2_sa(a_ref, w_ref, o_ref, *, chunk):
        tb = o_ref.shape[0]
        for ci in range(tb // chunk):
            a1 = a_ref[ci * chunk * t1 : (ci + 1) * chunk * t1]
            z = jax.lax.dot_general(
                a1, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t1, 240)
            s = (z[:, 0:t2, 0:c2] + z[:, 1:t2+1, c2:2*c2]
                 + z[:, 2:t2+2, 2*c2:3*c2])
            o_ref[ci * chunk : (ci + 1) * chunk] = (s >> 9).astype(jnp.int8)

    run_conv(k_conv2_sa, [w2], "conv2 mm + 80-lane shiftadd (current)",
             t1 * 512 * 256)

if "padN" in probes:
    # taps-on-N, each tap padded to 128 lanes: slices are tile-aligned
    w2p = rng.integers(-100, 100, (512, 384)).astype(np.int8)

    def k_padn(a_ref, w_ref, o_ref, *, chunk):
        tb = o_ref.shape[0]
        for ci in range(tb // chunk):
            a1 = a_ref[ci * chunk * t1 : (ci + 1) * chunk * t1]
            z = jax.lax.dot_general(
                a1, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t1, 384)
            s = (z[:, 0:t2, 0:128] + z[:, 1:t2+1, 128:256]
                 + z[:, 2:t2+2, 256:384])
            o_ref[ci * chunk : (ci + 1) * chunk] = (s >> 9).astype(jnp.int8)

    run_conv(k_padn, [w2p], "conv2 taps-on-N 128-pad + shiftadd",
             t1 * 512 * 384, out_lanes=128)

    # + real requantize epilogue
    m2 = rng.random(128).astype(np.float32) * 1e-3
    o2 = rng.random(128).astype(np.float32)

    def k_padn_rq(a_ref, w_ref, m_ref, o2_ref, o_ref, *, chunk):
        tb = o_ref.shape[0]
        for ci in range(tb // chunk):
            a1 = a_ref[ci * chunk * t1 : (ci + 1) * chunk * t1]
            z = jax.lax.dot_general(
                a1, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t1, 384)
            s = (z[:, 0:t2, 0:128] + z[:, 1:t2+1, 128:256]
                 + z[:, 2:t2+2, 256:384])
            o_ref[ci * chunk : (ci + 1) * chunk] = requantize(
                s, m_ref[:], o2_ref[:], relu=True)

    run_conv(k_padn_rq, [w2p, m2, o2],
             "conv2 taps-on-N 128-pad + shiftadd + rq",
             t1 * 512 * 384, out_lanes=128, BB=32)

if "tapK" in probes:
    # taps-on-K: three sublane-offset dots accumulated, N = 128
    w2k = rng.integers(-100, 100, (3, 512, 128)).astype(np.int8)
    w2k2 = w2k.reshape(3 * 512, 128)

    def k_tapk(a_ref, w_ref, o_ref, *, chunk):
        tb = o_ref.shape[0]
        m = chunk * t1 - 2
        for ci in range(tb // chunk):
            base = ci * chunk * t1
            acc = None
            for k in range(3):
                a1 = a_ref[base + k : base + k + m]
                d = jax.lax.dot_general(
                    a1, w_ref[k * 512 : (k + 1) * 512],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = d if acc is None else acc + d
            z = jnp.pad(acc, ((0, 2), (0, 0))).reshape(chunk, t1, 128)
            o_ref[ci * chunk : (ci + 1) * chunk] = (
                z[:, :t2] >> 9).astype(jnp.int8)

    run_conv(k_tapk, [w2k2], "conv2 taps-on-K 3-dot accum N=128",
             3 * t1 * 512 * 128, out_lanes=128)

if "rq" in probes:
    # isolated requantize of the conv1 activation (chunk*t1, 512) i32 -> i8
    m1 = rng.random(512).astype(np.float32) * 1e-3
    o1 = rng.random(512).astype(np.float32)

    def k_rq(a_ref, m_ref, o_ref, out_ref, *, chunk):
        tb = out_ref.shape[0]
        for ci in range(tb // chunk):
            a1 = a_ref[ci * chunk * t1 : (ci + 1) * chunk * t1].astype(
                jnp.int32)
            q = requantize(a1, m_ref[:], o_ref[:], relu=True)
            out_ref[ci * chunk * t1 : (ci + 1) * chunk * t1] = q

    a1_full = jnp.asarray(
        rng.integers(0, 127, (batch * t1, 512)).astype(np.int8))
    cj = [jnp.asarray(m1), jnp.asarray(o1)]

    def body(carry):
        out = pl.pallas_call(
            functools.partial(k_rq, chunk=CH),
            grid=(batch // BB,),
            in_specs=[pl.BlockSpec((BB * t1, 512), lambda i: (i, 0)),
                      pl.BlockSpec((512,), lambda i: (0,)),
                      pl.BlockSpec((512,), lambda i: (0,))],
            out_specs=pl.BlockSpec((BB * t1, 512), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((batch * t1, 512), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(carry, *cj)
        return out

    sec = measure_per_iter_chained(body, a1_full, n1=4, n2=20)
    report("requantize pass (B*t1,512) i32->i8", sec,
           batch * t1 * 512, unit="Telt")
