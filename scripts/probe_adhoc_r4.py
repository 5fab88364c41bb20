"""Ad-hoc r4 probe scripts (verbatim /tmp originals, 2026-08-21).

Findings summarized in scripts/probe.py (r4 addenda block). Kept verbatim
so every number in that block can be re-derived. Run sections manually;
each was a standalone script against one TPU process.
"""

# ======================================================= probe_r4g.py
# import sys
# sys.path.insert(0, "/root/repo")
# import functools
# import jax, jax.numpy as jnp, numpy as np
# from jax.experimental import pallas as pl
# from jax.experimental.pallas import tpu as pltpu
# from modulationdetectioncnn_tpu.utils.device import warm_transfer_async
# from modulationdetectioncnn_tpu.utils.timing import measure_per_iter_chained
# 
# warm_transfer_async().wait(timeout=1200)
# print("warm", flush=True)
# rng = np.random.default_rng(0)
# BATCH, BB, CH, t_len = 4096, 64, 16, 128
# inv_sx = np.float32(1.27)
# w1b = jnp.asarray((rng.integers(-100, 100, (8, 512)) * 2.0 ** -10).astype(np.float32)).astype(jnp.bfloat16)
# w2r = jnp.asarray(rng.integers(-100, 100, (512, 256)).astype(np.int8))
# conv_work = 2 * BATCH * t_len * (8 + 256) * 512
# 
# def chain(name, fn, x0, work=None):
#     jfn = jax.jit(fn)
#     def body(xc):
#         out = jfn(xc)
#         probe = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)
#         return xc + (probe * jnp.float32(1e-38)).astype(xc.dtype)
#     pilot = measure_per_iter_chained(body, x0, n1=4, n2=16)
#     delta = max(32, min(2000, int(0.06 / max(pilot, 1e-6))))
#     sec = measure_per_iter_chained(body, x0, n1=8, n2=8 + delta)
#     rate = f" {work/sec/1e12:7.2f} TOPS" if work else ""
#     print(f"{name:40s} {sec*1e6:8.1f} us{rate}", flush=True)
#     return sec
# 
# xw = jnp.asarray(rng.standard_normal((BATCH, 2, t_len)).astype(np.float32))
# 
# def make(o2, k2, spec2d):
#     def kern(x_ref, w1_ref, w2_ref, o2_ref, k2_ref, o_ref, *, chunk):
#         tb = x_ref.shape[0]
#         m = chunk * t_len
#         for ci in range(tb // chunk):
#             xb = x_ref[ci * chunk:(ci + 1) * chunk]
#             q2 = jnp.clip(jnp.round(xb * inv_sx), -127.0, 127.0)
#             xp = jnp.concatenate([q2, pltpu.roll(q2, t_len - 1, 2), pltpu.roll(q2, t_len - 2, 2),
#                                   jnp.ones_like(q2[:, :1]), jnp.zeros_like(q2[:, :1])], axis=1)
#             xe = jnp.swapaxes(xp.astype(jnp.bfloat16), 1, 2).reshape(m, 8)
#             a1f = jax.lax.dot_general(xe, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
#             a1q = jnp.clip(a1f, 0.0, 127.0).astype(jnp.int8)
#             z = jax.lax.dot_general(a1q, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32).reshape(chunk, t_len, 256)
#             r1 = pltpu.roll(z, 256 - 80, 2)
#             r2 = pltpu.roll(z, 256 - 160, 2)
#             s = (z[:, 0:t_len - 2, 0:t_len] + r1[:, 1:t_len - 1, 0:t_len] + r2[:, 2:t_len, 0:t_len])
#             s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
#             v = jnp.right_shift(s + o2_ref[:], k2_ref[:])
#             o_ref[ci * chunk:(ci + 1) * chunk] = jnp.clip(v, 0, 127).astype(jnp.int8)
#     consts = [w1b, w2r, o2, k2]
#     def _spec(a):
#         s = np.asarray(a).shape
#         return pl.BlockSpec(s, (lambda i: (0,)) if len(s) == 1 else (lambda i: (0, 0)))
#     def f(x):
#         return pl.pallas_call(
#             functools.partial(kern, chunk=CH),
#             grid=(BATCH // BB,),
#             in_specs=[pl.BlockSpec((BB, 2, t_len), lambda i: (i, 0, 0))] + [_spec(c) for c in consts],
#             out_specs=pl.BlockSpec((BB, t_len, 128), lambda i: (i, 0, 0)),
#             out_shape=jax.ShapeDtypeStruct((BATCH, t_len, 128), jnp.int8),
#             compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
#         )(x, *consts)
#     return f
# 
# kvar = rng.integers(8, 13, 128).astype(np.int32)
# ovar = rng.integers(0, 1 << 12, 128).astype(np.int32)
# cases = [
#     ("1d varying shift (production)", jnp.asarray(ovar), jnp.asarray(kvar)),
#     ("1d uniform shift", jnp.asarray(ovar), jnp.asarray(np.full(128, 9, np.int32))),
#     ("2d varying shift", jnp.asarray(ovar[None]), jnp.asarray(kvar[None])),
#     ("2d uniform shift", jnp.asarray(ovar[None]), jnp.asarray(np.full((1, 128), 9, np.int32))),
# ]
# for name, o2, k2 in cases:
#     try:
#         chain(name, make(o2, k2, None), xw, conv_work)
#     except Exception as e:
#         print(f"{name}: FAILS {str(e)[:140]}", flush=True)

# ======================================================= probe_r4h.py
# import sys
# sys.path.insert(0, "/root/repo")
# import jax, jax.numpy as jnp, numpy as np
# from modulationdetectioncnn_tpu.utils.device import warm_transfer_async
# from modulationdetectioncnn_tpu.utils.timing import measure_per_iter_chained
# from modulationdetectioncnn_tpu.config import AmcConfig
# from modulationdetectioncnn_tpu.models import VTCNN2
# from modulationdetectioncnn_tpu.train.quant import quantize
# from modulationdetectioncnn_tpu.ops import infer
# 
# warm_transfer_async().wait(timeout=1200)
# print("warm", flush=True)
# rng = np.random.default_rng(0)
# cfg = AmcConfig()
# model = VTCNN2.from_config(cfg.model)
# params = model.init(jax.random.key(0), jnp.zeros((2, 2, 128)))
# calib = rng.standard_normal((256, 2, 128)).astype(np.float32)
# qm = quantize(model, params, calib)
# B = 4096
# x0 = jnp.asarray(rng.standard_normal((B, 2, 128)).astype(np.float32))
# 
# def chain(name, fn):
#     jfn = jax.jit(fn)
#     def body(xc):
#         out = jfn(xc)
#         probe = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)
#         return xc + (probe * jnp.float32(1e-38)).astype(xc.dtype)
#     pilot = measure_per_iter_chained(body, x0, n1=4, n2=16)
#     delta = max(32, min(2000, int(0.06 / max(pilot, 1e-6))))
#     sec = measure_per_iter_chained(body, x0, n1=8, n2=8 + delta)
#     print(f"{name:30s} {sec*1e6:8.1f} us  -> {B*128/sec/1e6:.1f} MS/s", flush=True)
# 
# for bb, ch in ((128, 8), (128, 4), (128, 16), (256, 8), (192, 8), (512, 8), (256, 4)):
#     try:
#         c = infer.make_int8_classifier_v9(qm, block_b=bb, chunk=ch)
#         chain(f"v9 bb={bb} ch={ch}", c)
#     except Exception as e:
#         print(f"bb={bb} ch={ch}: FAILS {str(e)[:120]}", flush=True)

# ======================================================= probe_timing2.py
# import sys, functools
# sys.path.insert(0, "/root/repo")
# import jax, jax.numpy as jnp, numpy as np
# from jax.experimental import pallas as pl
# from jax.experimental.pallas import tpu as pltpu
# from modulationdetectioncnn_tpu.utils.device import warm_transfer_async
# from modulationdetectioncnn_tpu.utils.timing import measure_per_iter_chained
# from modulationdetectioncnn_tpu.golden.dsp import design_interp
# 
# warm_transfer_async().wait(timeout=1200)
# print("warm", flush=True)
# rng = np.random.default_rng(0)
# B, t_len, t_n, p_n = 4096, 128, 8, 32
# n_big = 2 * t_n + 1
# tp = t_len + 2 * t_n
# 
# def chain(name, fn, x0):
#     jfn = jax.jit(fn)
#     def body(xc):
#         out = jfn(xc)
#         probe = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)
#         return xc + (probe * jnp.float32(1e-38)).astype(xc.dtype)
#     pilot = measure_per_iter_chained(body, x0, n1=4, n2=16)
#     delta = max(32, min(3000, int(0.06 / max(pilot, 1e-6))))
#     sec = measure_per_iter_chained(body, x0, n1=8, n2=8 + delta)
#     print(f"{name:40s} {sec*1e6:8.1f} us", flush=True)
# 
# x0 = jnp.asarray(rng.standard_normal((B, 2, 128)).astype(np.float32))
# tau0 = jnp.asarray(rng.uniform(0, 8, B).astype(np.float32))
# 
# # stage 1: tau -> cbig (all the small-tensor XLA work)
# h = design_interp(p_n, t_n)
# g = np.zeros((p_n, t_n + 1))
# for p in range(p_n):
#     gp = h[p::p_n]; g[p, :len(gp)] = gp
# grev = jnp.asarray(np.ascontiguousarray(g[:, ::-1]).astype(np.float32))
# c = (p_n * t_n + 1 - 1) // 2
# 
# def build_cbig(tau):
#     tau_c = ((tau + 4.0) % 8.0) - 4.0
#     s = jnp.round(tau_c * p_n).astype(jnp.int32) + c
#     d, p = s // p_n, s % p_n
#     ph = jax.nn.one_hot(p, p_n, dtype=jnp.float32)
#     w = ph @ grev
#     jlane = jnp.arange(n_big, dtype=jnp.int32)[None, :]
#     cbig = jnp.zeros((B, n_big), jnp.float32)
#     for i in range(t_n + 1):
#         cbig = cbig + jnp.where(jlane == (d[:, None] + i), w[:, i][:, None], 0.0)
#     return cbig
# 
# chain("cbig build only", lambda x: build_cbig(tau0), x0)
# 
# # stage 2: pad+reshape+repeat
# def prep(x):
#     xp = jnp.pad(x, [(0, 0), (0, 0), (t_n, t_n)])
#     return xp.reshape(B * 2, tp)
# chain("pad+reshape only", prep, x0)
# 
# # stage 3: the pallas kernel alone
# cb2 = jnp.asarray(rng.standard_normal((B * 2, n_big)).astype(np.float32))
# def make_kern(bb):
#     def kern(x_ref, c_ref, o_ref):
#         acc = jnp.zeros((bb, t_len), jnp.float32)
#         xv = x_ref[:]
#         for j in range(n_big):
#             rolled = pltpu.roll(xv, (tp - j) % tp, 1)
#             acc = acc + rolled[:, :t_len] * c_ref[:, j][:, None]
#         o_ref[:] = acc
#     def f(x2):
#         return pl.pallas_call(
#             kern, grid=(B * 2 // bb,),
#             in_specs=[pl.BlockSpec((bb, tp), lambda i: (i, 0)),
#                       pl.BlockSpec((bb, n_big), lambda i: (i, 0))],
#             out_specs=pl.BlockSpec((bb, t_len), lambda i: (i, 0)),
#             out_shape=jax.ShapeDtypeStruct((B * 2, t_len), jnp.float32),
#             compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
#         )(x2, cb2)
#     return f
# x2 = jnp.asarray(rng.standard_normal((B * 2, tp)).astype(np.float32))
# for bb in (512, 1024):
#     chain(f"pallas roll-MAC kernel bb={bb}", make_kern(bb), x2)

# ======================================================= probe_r4i.py
# import sys, functools
# sys.path.insert(0, "/root/repo")
# import jax, jax.numpy as jnp, numpy as np
# from jax.experimental import pallas as pl
# from jax.experimental.pallas import tpu as pltpu
# from modulationdetectioncnn_tpu.utils.device import warm_transfer_async
# from modulationdetectioncnn_tpu.utils.timing import measure_per_iter_chained
# 
# warm_transfer_async().wait(timeout=1200)
# print("warm", flush=True)
# rng = np.random.default_rng(0)
# BATCH, t_len = 4096, 128
# inv_sx = np.float32(1.27)
# w1b = jnp.asarray((rng.integers(-100, 100, (8, 512)) * 2.0 ** -10).astype(np.float32)).astype(jnp.bfloat16)
# w2r = jnp.asarray(rng.integers(-100, 100, (512, 256)).astype(np.int8))
# o2i = jnp.asarray(rng.integers(0, 1 << 12, 128).astype(np.int32))
# k2 = jnp.asarray(rng.integers(8, 13, 128).astype(np.int32))
# consts = [w1b, w2r, o2i, k2]
# conv_work = 2 * BATCH * t_len * (8 + 256) * 512
# xw = jnp.asarray(rng.standard_normal((BATCH, 2, t_len)).astype(np.float32))
# 
# def chain(name, fn):
#     jfn = jax.jit(fn)
#     def body(xc):
#         out = jfn(xc)
#         probe = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)
#         return xc + (probe * jnp.float32(1e-38)).astype(xc.dtype)
#     pilot = measure_per_iter_chained(body, xw, n1=4, n2=16)
#     delta = max(32, min(2000, int(0.06 / max(pilot, 1e-6))))
#     sec = measure_per_iter_chained(body, xw, n1=8, n2=8 + delta)
#     print(f"{name:34s} {sec*1e6:8.1f} us  {conv_work/sec/1e12:6.1f} TOPS -> {BATCH*128/sec/1e6:.1f} MS/s conv-only", flush=True)
# 
# def make_v11(bb, ch1, ch2):
#     def kern(x_ref, w1_ref, w2_ref, o2_ref, k2_ref, o_ref):
#         m_all = bb * t_len
#         # block-level tap build (once)
#         q2 = jnp.clip(jnp.round(x_ref[:] * inv_sx), -127.0, 127.0)
#         xp = jnp.concatenate([q2, pltpu.roll(q2, t_len - 1, 2), pltpu.roll(q2, t_len - 2, 2),
#                               jnp.ones_like(q2[:, :1]), jnp.zeros_like(q2[:, :1])], axis=1)
#         xe = jnp.swapaxes(xp.astype(jnp.bfloat16), 1, 2).reshape(m_all, 8)
#         # conv1 in ch1-frame sub-chunks -> int8 a1q pieces
#         m1 = ch1 * t_len
#         qs = []
#         for ci in range(bb // ch1):
#             a1f = jax.lax.dot_general(xe[ci * m1:(ci + 1) * m1], w1_ref[:],
#                                       (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
#             qs.append(jnp.clip(a1f, 0.0, 127.0).astype(jnp.int8))
#         a1q = jnp.concatenate(qs, axis=0)  # (bb*T, 512) int8
#         # conv2 in ch2-frame chunks
#         m2 = ch2 * t_len
#         for ci in range(bb // ch2):
#             z = jax.lax.dot_general(a1q[ci * m2:(ci + 1) * m2], w2_ref[:],
#                                     (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
#                                     ).reshape(ch2, t_len, 256)
#             r1 = pltpu.roll(z, 256 - 80, 2)
#             r2 = pltpu.roll(z, 256 - 160, 2)
#             s = (z[:, 0:t_len - 2, 0:t_len] + r1[:, 1:t_len - 1, 0:t_len] + r2[:, 2:t_len, 0:t_len])
#             s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
#             v = jnp.right_shift(s + o2_ref[:], k2_ref[:])
#             o_ref[ci * ch2:(ci + 1) * ch2] = jnp.clip(v, 0, 127).astype(jnp.int8)
#     def f(x):
#         return pl.pallas_call(
#             kern, grid=(BATCH // bb,),
#             in_specs=[pl.BlockSpec((bb, 2, t_len), lambda i: (i, 0, 0))]
#             + [pl.BlockSpec(np.asarray(c).shape, (lambda i: (0,)) if np.asarray(c).ndim == 1 else (lambda i: (0, 0))) for c in consts],
#             out_specs=pl.BlockSpec((bb, t_len, 128), lambda i: (i, 0, 0)),
#             out_shape=jax.ShapeDtypeStruct((BATCH, t_len, 128), jnp.int8),
#             compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
#         )(x, *consts)
#     return f
# 
# for bb, ch1, ch2 in ((32, 16, 16), (32, 32, 16), (64, 32, 16), (64, 16, 16)):
#     try:
#         chain(f"v11 bb={bb} ch1={ch1} ch2={ch2}", make_v11(bb, ch1, ch2))
#     except Exception as e:
#         print(f"v11 {bb}/{ch1}/{ch2}: FAILS {str(e)[:140]}", flush=True)

# ======================================================= probe_r4j.py
# import sys, functools
# sys.path.insert(0, "/root/repo")
# import jax, jax.numpy as jnp, numpy as np
# from jax.experimental import pallas as pl
# from jax.experimental.pallas import tpu as pltpu
# from modulationdetectioncnn_tpu.utils.device import warm_transfer_async
# from modulationdetectioncnn_tpu.utils.timing import measure_per_iter_chained
# 
# warm_transfer_async().wait(timeout=1200)
# print("warm", flush=True)
# rng = np.random.default_rng(0)
# BATCH, t_len, CH = 4096, 128, 16
# inv_sx = np.float32(1.27)
# w1b = jnp.asarray((rng.integers(-100, 100, (8, 512)) * 2.0 ** -10).astype(np.float32)).astype(jnp.bfloat16)
# w2r = jnp.asarray(rng.integers(-100, 100, (512, 256)).astype(np.int8))
# o2i = jnp.asarray(rng.integers(0, 1 << 12, 128).astype(np.int32))
# k2 = jnp.asarray(rng.integers(8, 13, 128).astype(np.int32))
# w3a = jnp.asarray(rng.integers(-100, 100, (t_len * 128, 256)).astype(np.int8))
# o3i = jnp.asarray(rng.integers(0, 1 << 12, 256).astype(np.int32))
# k3 = jnp.asarray(rng.integers(8, 13, 256).astype(np.int32))
# w4 = jnp.asarray(rng.integers(-100, 100, (256, 128)).astype(np.int8))
# s4 = jnp.asarray(rng.random(128).astype(np.float32) * 1e-3)
# b4 = jnp.asarray(rng.random(128).astype(np.float32))
# fcs = [w1b, w2r, o2i, k2, w3a, o3i, k3, w4, s4, b4]
# full_work = 2 * BATCH * (t_len * (8 + 256) * 512 + t_len * 128 * 256 + 256 * 128)
# xw = jnp.asarray(rng.standard_normal((BATCH, 2, t_len)).astype(np.float32))
# 
# def chain(name, fn):
#     jfn = jax.jit(fn)
#     def body(xc):
#         out = jfn(xc)
#         probe = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)
#         return xc + (probe * jnp.float32(1e-38)).astype(xc.dtype)
#     pilot = measure_per_iter_chained(body, xw, n1=4, n2=16)
#     delta = max(32, min(2000, int(0.06 / max(pilot, 1e-6))))
#     sec = measure_per_iter_chained(body, xw, n1=8, n2=8 + delta)
#     print(f"{name:30s} {sec*1e6:8.1f} us -> FULL {BATCH*128/sec/1e6:.1f} MS/s", flush=True)
# 
# def make_fused(bb, ch):
#     def kern(x_ref, w1_ref, w2_ref, o2_ref, k2_ref, w3_ref, o3_ref, k3_ref,
#              w4_ref, s4_ref, b4_ref, o_ref, h_scr):
#         m = ch * t_len
#         for ci in range(bb // ch):
#             xb = x_ref[ci * ch:(ci + 1) * ch]
#             q2 = jnp.clip(jnp.round(xb * inv_sx), -127.0, 127.0)
#             xp = jnp.concatenate([q2, pltpu.roll(q2, t_len - 1, 2), pltpu.roll(q2, t_len - 2, 2),
#                                   jnp.ones_like(q2[:, :1]), jnp.zeros_like(q2[:, :1])], axis=1)
#             xe = jnp.swapaxes(xp.astype(jnp.bfloat16), 1, 2).reshape(m, 8)
#             a1f = jax.lax.dot_general(xe, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
#             a1q = jnp.clip(a1f, 0.0, 127.0).astype(jnp.int8)
#             z = jax.lax.dot_general(a1q, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32).reshape(ch, t_len, 256)
#             r1 = pltpu.roll(z, 256 - 80, 2)
#             r2 = pltpu.roll(z, 256 - 160, 2)
#             s = (z[:, 0:t_len - 2, 0:t_len] + r1[:, 1:t_len - 1, 0:t_len] + r2[:, 2:t_len, 0:t_len])
#             s = jnp.pad(s, ((0, 0), (0, 2), (0, 0)))
#             v = jnp.right_shift(s + o2_ref[:], k2_ref[:])
#             h_scr[ci * ch:(ci + 1) * ch] = jnp.clip(v, 0, 127).astype(jnp.int8)
#         h = h_scr[:].reshape(bb, t_len * 128)
#         acc3 = jax.lax.dot_general(h, w3_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
#         a3 = jnp.clip(jnp.right_shift(acc3 + o3_ref[:], k3_ref[:]), 0, 127).astype(jnp.int8)
#         acc4 = jax.lax.dot_general(a3, w4_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
#         logits = acc4.astype(jnp.float32) * s4_ref[:] + b4_ref[:]
#         lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
#         logits = jnp.where(lane < 11, logits, -jnp.inf)
#         mx = jnp.max(logits, axis=-1, keepdims=True)
#         idx = jnp.where(logits >= mx, lane, 128)
#         o_ref[:] = jnp.min(idx, axis=-1, keepdims=True)
#     def f(x):
#         return pl.pallas_call(
#             kern, grid=(BATCH // bb,),
#             in_specs=[pl.BlockSpec((bb, 2, t_len), lambda i: (i, 0, 0))]
#             + [pl.BlockSpec(np.asarray(c).shape, (lambda i: (0,)) if np.asarray(c).ndim == 1 else (lambda i: (0, 0))) for c in fcs],
#             out_specs=pl.BlockSpec((bb, 1), lambda i: (i, 0)),
#             out_shape=jax.ShapeDtypeStruct((BATCH, 1), jnp.int32),
#             scratch_shapes=[pltpu.VMEM((bb, t_len, 128), jnp.int8)],
#             compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
#         )(x, *fcs)
#     return f
# 
# for bb, ch in ((128, 16), (64, 16), (192, 16)):
#     try:
#         chain(f"FUSED-int bb={bb} ch={ch}", make_fused(bb, ch))
#     except Exception as e:
#         print(f"fused {bb}: FAILS {str(e)[:130]}", flush=True)
