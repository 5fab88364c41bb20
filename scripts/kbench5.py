"""Focused per-stage probes of the fused int8 forward (scripts/kbench4.py
successor — skips the blocking transfer warm; all timing is chained so the
tunnel cannot flatter it).

Usage: python scripts/kbench5.py [probe ...]
Probes: ceil conv dense conv_norq conv_blocks e2e
"""
from __future__ import annotations

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from modulationdetectioncnn_tpu.config import AmcConfig
from modulationdetectioncnn_tpu.models import VTCNN2
from modulationdetectioncnn_tpu.ops import infer
from modulationdetectioncnn_tpu.train.quant import quantize
from modulationdetectioncnn_tpu.utils.timing import measure_per_iter_chained

rng = np.random.default_rng(0)
batch = 4096
t_in, c2 = 128, 80
t1, t2 = t_in - 2, t_in - 4
FRAME_MACS = 140_000 * t_in / 128  # ~140K MACs per IQ sample * frame len


def report(name, sec, work, unit="TOPS"):
    rate = work / sec / 1e12
    print(f"{name:46s} {sec*1e6:9.1f} us  {rate:7.2f} {unit}", flush=True)


probes = sys.argv[1:] or ["ceil", "conv", "dense", "conv_norq", "e2e"]

cfg = AmcConfig()
model = VTCNN2.from_config(cfg.model)
params = model.init(jax.random.key(0), jnp.zeros((2, 2, t_in)))
calib = rng.standard_normal((256, 2, t_in)).astype(np.float32)
qm = quantize(model, params, calib)

if "ceil" in probes:
    a0 = jnp.asarray(rng.integers(-127, 127, (2048, 2048)).astype(np.int8))
    b0 = jnp.asarray(rng.integers(-127, 127, (2048, 2048)).astype(np.int8))

    def body_i8(c):
        y = jax.lax.dot_general(c, b0, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y & 127).astype(jnp.int8)

    sec = measure_per_iter_chained(body_i8, a0, n1=50, n2=250)
    report("int8 dot 2048^3 ceiling", sec, 2 * 2048**3)

# ---- conv stage alone (current v2 shapes), chained via the input bytes
if "conv" in probes or "conv_norq" in probes or "conv_blocks" in probes:
    w1e = infer.expand_conv1_weights(qm.w1p)
    conv_consts = [jnp.asarray(a) for a in (w1e, qm.m1, qm.o1, qm.w2p,
                                            qm.m2, qm.o2)]
    x_i8 = jnp.asarray(rng.integers(-127, 127, (batch * t1, 8)).astype(np.int8))
    # padded-slot work per frame: conv1 126*128*512 + conv2 126*512*256
    conv_slots = t1 * 128 * 512 + t1 * 512 * 256

    def make_conv(block_b, chunk, kernel):
        def call(xe):
            return pl.pallas_call(
                functools.partial(kernel, chunk=chunk, t1=t1, c2=c2),
                grid=(batch // block_b,),
                in_specs=[pl.BlockSpec((block_b * t1, 8), lambda i: (i, 0))]
                + [pl.BlockSpec(a.shape, (lambda i: (0,)) if a.ndim == 1
                                else (lambda i: (0, 0))) for a in conv_consts],
                out_specs=pl.BlockSpec((block_b, t2, c2), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((batch, t2, c2), jnp.int8),
                compiler_params=jax.experimental.pallas.tpu.CompilerParams(
                    dimension_semantics=("parallel",),
                ),
            )(xe, *conv_consts)

        def body(carry):
            out = call(carry)
            # feed output bytes back as next input (shape mismatch: tile)
            flat = out.reshape(-1)
            need = batch * t1 * 8
            reps = -(-need // flat.shape[0])
            nxt = jnp.tile(flat, reps)[:need].reshape(batch * t1, 8)
            return nxt

        return body

    import jax.experimental.pallas.tpu  # noqa: F401  (namespace for call)

if "conv" in probes:
    for block_b, chunk in [(64, 16), (128, 16), (128, 32), (256, 32), (64, 8)]:
        try:
            body = make_conv(block_b, chunk, infer._conv_stage_int8_v2_kernel)
            sec = measure_per_iter_chained(body, x_i8, n1=4, n2=20)
            report(f"conv stage v2 bb={block_b} ch={chunk}", sec,
                   2 * batch * conv_slots)
        except Exception as e:  # noqa: BLE001
            print(f"conv bb={block_b} ch={chunk} FAILED: {type(e).__name__}",
                  flush=True)

if "conv_norq" in probes:
    # same matmuls, requantize replaced by shift+mask (cheap int ops) to
    # isolate the VPU fp32-affine cost
    def _conv_norq_kernel(xe_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref,
                          o2_ref, o_ref, *, chunk, t1, c2):
        tb = o_ref.shape[0]
        t2 = t1 - 2
        for ci in range(tb // chunk):
            xe = xe_ref[ci * chunk * t1 : (ci + 1) * chunk * t1]
            a1 = jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            a1q = (a1 >> 7).astype(jnp.int8)
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t1, 3 * c2)
            s = infer._shift_add(z, t2, c2)
            o_ref[ci * chunk : (ci + 1) * chunk] = (s >> 9).astype(jnp.int8)

    for block_b, chunk in [(64, 16), (128, 32)]:
        body = make_conv(block_b, chunk, _conv_norq_kernel)
        sec = measure_per_iter_chained(body, x_i8, n1=4, n2=20)
        report(f"conv stage NO-requant bb={block_b} ch={chunk}", sec,
               2 * batch * conv_slots)

    # and matmuls only: drop the shift_add too, write z back directly
    def _conv_mm_kernel(xe_ref, w1_ref, m1_ref, o1_ref, w2_ref, m2_ref,
                        o2_ref, o_ref, *, chunk, t1, c2):
        tb = o_ref.shape[0]
        t2 = t1 - 2
        for ci in range(tb // chunk):
            xe = xe_ref[ci * chunk * t1 : (ci + 1) * chunk * t1]
            a1 = jax.lax.dot_general(
                xe, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            a1q = (a1 >> 7).astype(jnp.int8)
            z = jax.lax.dot_general(
                a1q, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t1, 3 * c2)
            o_ref[ci * chunk : (ci + 1) * chunk] = (
                z[:, :t2, :c2] >> 9).astype(jnp.int8)

    body = make_conv(64, 16, _conv_mm_kernel)
    sec = measure_per_iter_chained(body, x_i8, n1=4, n2=20)
    report("conv stage MATMULS-ONLY bb=64 ch=16", sec, 2 * batch * conv_slots)

    # conv2 matmul only (no conv1): how fast is the dominant matmul alone?
    def _conv2_only_kernel(a1_ref, w2_ref, o_ref, *, chunk, t1, c2):
        tb = o_ref.shape[0]
        t2 = t1 - 2
        for ci in range(tb // chunk):
            a1 = a1_ref[ci * chunk * t1 : (ci + 1) * chunk * t1]
            z = jax.lax.dot_general(
                a1, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(chunk, t1, 3 * c2)
            o_ref[ci * chunk : (ci + 1) * chunk] = (
                z[:, :t2, :c2] >> 9).astype(jnp.int8)

    a1_full = jnp.asarray(
        rng.integers(0, 127, (batch * t1, 512)).astype(np.int8))
    w2j = jnp.asarray(qm.w2p)

    def conv2_body(carry):
        block_b, chunk = 64, 16
        out = pl.pallas_call(
            functools.partial(_conv2_only_kernel, chunk=chunk, t1=t1, c2=c2),
            grid=(batch // block_b,),
            in_specs=[
                pl.BlockSpec((block_b * t1, 512), lambda i: (i, 0)),
                pl.BlockSpec(w2j.shape, lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((block_b, t2, c2), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((batch, t2, c2), jnp.int8),
            compiler_params=jax.experimental.pallas.tpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(carry, w2j)
        flat = out.reshape(-1)
        need = batch * t1 * 512
        reps = -(-need // flat.shape[0])
        return jnp.tile(flat, reps)[:need].reshape(batch * t1, 512)

    sec = measure_per_iter_chained(conv2_body, a1_full, n1=4, n2=20)
    report("conv2 matmul ONLY bb=64 ch=16", sec,
           2 * batch * t1 * 512 * 256)

if "dense" in probes:
    w4 = infer._pad_cols(qm.w4)
    s4 = infer._pad_cols(qm.s4)
    b4 = infer._pad_cols(qm.b4)
    dense_consts = [jnp.asarray(a) for a in (qm.w3, qm.m3, qm.o3, w4, s4, b4)]
    h0 = jnp.asarray(
        rng.integers(0, 127, (batch, t2 * c2)).astype(np.int8))
    dense_slots = t2 * c2 * 256 + 256 * 128

    for dbb in [256, 512, 1024]:
        def dense_body(carry, dbb=dbb):
            logits = pl.pallas_call(
                infer._dense_stage_int8_kernel,
                grid=(batch // dbb,),
                in_specs=[pl.BlockSpec((dbb, t2 * c2), lambda i: (i, 0))]
                + [pl.BlockSpec(a.shape, (lambda i: (0,)) if a.ndim == 1
                                else (lambda i: (0, 0)))
                   for a in dense_consts],
                out_specs=pl.BlockSpec((dbb, 128), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((batch, 128), jnp.float32),
                compiler_params=jax.experimental.pallas.tpu.CompilerParams(
                    dimension_semantics=("parallel",),
                ),
            )(carry, *dense_consts)
            v = jnp.clip(logits[:, :1], -1, 1).astype(jnp.int8)  # tiny dep
            return jax.lax.dynamic_update_slice(
                carry, jnp.broadcast_to(v, (batch, 1)), (0, 0))

        sec = measure_per_iter_chained(dense_body, h0, n1=4, n2=20)
        report(f"dense stage dbb={dbb}", sec, 2 * batch * dense_slots)

if "e2e" in probes:
    fwd = infer.make_int8_forward_v2(qm)
    x0 = jnp.asarray(
        rng.standard_normal((batch, 2, t_in)).astype(np.float32))

    def e2e_body(carry):
        logits = fwd(carry)
        v = logits[:, :1] * 1e-9
        return carry + v[:, None, :] * 0

    sec = measure_per_iter_chained(e2e_body, x0, n1=4, n2=20)
    fps = batch / sec
    print(f"e2e fused int8 v2: {fps/1e6:.2f} Mframe/s = "
          f"{fps*t_in/1e6:.0f} MS/s", flush=True)
