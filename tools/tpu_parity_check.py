"""TPU-only parity smoke: Pallas fused kernel vs the XLA onehot backend at
CSQA bench shapes, forward AND gradients, on the real chip.

The pytest suite is hermetically CPU-pinned (tests/conftest.py), so this
check runs standalone on TPU hardware:

    python tools/tpu_parity_check.py [--small]

Exit code 0 iff forward and all input cotangents of the two TPU backends
agree within bf16-accumulation tolerance.
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")


def check(small: bool = False, dtype: str = "bfloat16") -> bool:
    """Run the 3-way chip parity check; True iff all bands hold.

    Importable so the TPU-gated pytest (tests_tpu/test_chip_parity.py) can
    regression-test the bf16 gradient bands instead of relying on a
    manually-run tool.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/qagnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from qagnn_tpu.ops.gat_attention import relational_gat_attention_nodes

    assert jax.default_backend() == "tpu", (
        f"this check targets the real chip; got {jax.default_backend()}")

    if small:
        G, N, E, HD, H = 4, 16, 64, 32, 2
    else:
        G, N, E, HD, H = 8, 200, 4096, 200, 4
    dph = HD // H
    cdt = getattr(jnp, dtype)

    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), cdt)
    nq, nk, nm = f(G, N, HD), f(G, N, HD), f(G, N, HD)
    ekb, emb = f(G, E, HD), f(G, E, HD)
    skb, smb = f(G, N, HD), f(G, N, HD)
    src = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
    dst = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
    mask = jnp.asarray(rng.random((G, E)) > 0.25, bool)

    def run(backend, in_dtype, on_cpu=False):
        r = lambda t: t.reshape(t.shape[0], t.shape[1], H, dph)
        cast = tuple(t.astype(in_dtype)
                     for t in (nq, nk, nm, ekb, emb, skb, smb))

        @jax.jit
        def loss(diff):
            nq, nk, nm, ekb, emb, skb, smb = diff
            out = relational_gat_attention_nodes(
                r(nq), r(nk), r(nm), r(ekb), r(emb), r(skb), r(smb),
                src, dst, mask, backend=backend)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        if on_cpu:
            with jax.default_device(jax.devices("cpu")[0]):
                val, grads = jax.value_and_grad(loss)(
                    jax.device_put(cast, jax.devices("cpu")[0]))
        else:
            val, grads = jax.value_and_grad(loss)(cast)
        return float(val), [np.asarray(g, np.float32) for g in grads]

    # 3-way: both bf16 TPU backends measured against the TRUE f32
    # reference — the scatter backend at f32 on the HOST CPU (matmul-free,
    # so axon's f32-matmuls-run-bf16 default cannot contaminate it; the
    # HIGHEST-precision on-chip route compiles impractically slowly on the
    # tunneled service). Two bf16 implementations legitimately round
    # differently; each must sit in a comparable error band of the f32
    # truth — comparing them to each other conflates the two bands.
    v_ref, g_ref = run("scatter", jnp.float32, on_cpu=True)
    v_oh, g_oh = run("onehot", cdt)
    v_pl, g_pl = run("pallas", cdt)

    ok = True
    names = ["dnq", "dnk", "dnm", "dekb", "demb", "dskb", "dsmb"]
    print(f"forward loss: ref={v_ref:.6g} onehot={v_oh:.6g} "
          f"pallas={v_pl:.6g}")
    for v, tag in ((v_oh, "onehot"), (v_pl, "pallas")):
        rel = abs(v - v_ref) / max(abs(v_ref), 1e-9)
        print(f"  {tag} fwd rel vs f32: {rel:.2e}")
        ok &= rel < 2e-2
    print(f"{'grad':>6} {'onehot_max':>11} {'pallas_max':>11} "
          f"{'onehot_rms':>11} {'pallas_rms':>11}   (vs f32, / peak|g_f32|)")
    for name, ref, a, b in zip(names, g_ref, g_oh, g_pl):
        scale = max(np.abs(ref).max(), 1e-6)
        e_oh = np.abs(a - ref).max() / scale
        e_pl = np.abs(b - ref).max() / scale
        r_oh = np.sqrt(np.mean((a - ref) ** 2)) / scale
        r_pl = np.sqrt(np.mean((b - ref) ** 2)) / scale
        print(f"{name:>6} {e_oh:11.2e} {e_pl:11.2e} {r_oh:11.2e} "
              f"{r_pl:11.2e}")
        # The claim under test is COMPARATIVE: pallas is as accurate as the
        # established onehot bf16 path. Both backends show large MAX
        # deviations vs true f32 (bf16 rounding flips near-tie softmax
        # weights on single elements — measured ~0.5-0.95 of peak for BOTH)
        # with tiny RMS (~1e-3); an absolute max cap would reject onehot
        # itself. Require pallas within 1.25x of onehot's band, max + RMS.
        ok &= e_pl <= 1.25 * max(e_oh, 1e-3)
        ok &= r_pl <= 1.25 * max(r_oh, 1e-4)
    print("PARITY " + ("OK" if ok else "FAIL"))
    return bool(ok)


def check_projected(small: bool = False, dtype: str = "bfloat16") -> bool:
    """Production-path parity: the PROJECTED fused kernels through the full
    GATConvE module (in-kernel edge GEMMs, merged scores+denominator pass,
    aliased cotangent accumulation, linear_1 composition) vs the scatter
    oracle at f32 on the host CPU — same params, bf16-band criteria."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/qagnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from qagnn_tpu.models.gnn import QAGNNMessagePassing

    assert jax.default_backend() == "tpu", (
        f"this check targets the real chip; got {jax.default_backend()}")

    if small:
        G, N, E, D, K, H = 4, 16, 64, 32, 2, 2
    else:
        G, N, E, D, K, H = 8, 200, 2048, 200, 2, 4
    cdt = getattr(jnp, dtype)

    rng = np.random.default_rng(1)
    Hx = jnp.asarray(rng.standard_normal((G, N, D)), jnp.float32)
    node_type = jnp.asarray(rng.integers(0, 4, (G, N)), jnp.int32)
    node_score = jnp.asarray(rng.standard_normal((G, N)), jnp.float32)
    src = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
    dst = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
    etype = jnp.asarray(rng.integers(0, 38, (G, E)), jnp.int32)
    mask = jnp.asarray(rng.random((G, E)) > 0.25, bool)
    args = (Hx, node_type, node_score, src, dst, etype, mask)

    def build(backend, mdt):
        return QAGNNMessagePassing(k=K, n_ntype=4, n_etype=38, hidden_size=D,
                                   dropout=0.0, head_count=H,
                                   backend=backend, dtype=mdt)

    variables = build("scatter", jnp.float32).init(
        jax.random.PRNGKey(0), *args, train=False)

    def loss(backend, mdt, params, on_cpu=False):
        # train=True: exercises the production path end-to-end incl. the
        # fused encoder's analytic BatchNorm batch statistics
        def f(p):
            out, _ = build(backend, mdt).apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                *args, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(out.astype(jnp.float32) ** 2)

        if on_cpu:
            with jax.default_device(jax.devices("cpu")[0]):
                return jax.value_and_grad(f)(params)
        return jax.value_and_grad(f)(params)

    v_ref, g_ref = loss("scatter", jnp.float32, variables["params"],
                        on_cpu=True)
    v_oh, g_oh = loss("onehot", cdt, variables["params"])
    v_pl, g_pl = loss("pallas", cdt, variables["params"])

    ok = True
    print(f"[projected] forward loss: ref={float(v_ref):.6g} "
          f"onehot={float(v_oh):.6g} pallas={float(v_pl):.6g}")
    for v, tag in ((float(v_oh), "onehot"), (float(v_pl), "pallas")):
        rel = abs(v - float(v_ref)) / max(abs(float(v_ref)), 1e-9)
        print(f"  {tag} fwd rel vs f32: {rel:.2e}")
        ok &= rel < 2e-2
    import jax.tree_util as jtu
    flat_ref = jtu.tree_flatten_with_path(g_ref)[0]
    flat_oh = jax.tree.leaves(g_oh)
    flat_pl = jax.tree.leaves(g_pl)
    print(f"{'param':>40} {'onehot_rms':>11} {'pallas_rms':>11}")
    for (path, ref), a, b in zip(flat_ref, flat_oh, flat_pl):
        ref = np.asarray(ref, np.float32)
        scale = max(np.abs(ref).max(), 1e-6)
        r_oh = np.sqrt(np.mean((np.asarray(a, np.float32) - ref) ** 2)) / scale
        r_pl = np.sqrt(np.mean((np.asarray(b, np.float32) - ref) ** 2)) / scale
        name = jtu.keystr(path)
        print(f"{name[-40:]:>40} {r_oh:11.2e} {r_pl:11.2e}")
        ok &= r_pl <= 1.5 * max(r_oh, 3e-4)
    print("[projected] PARITY " + ("OK" if ok else "FAIL"))
    return bool(ok)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--skip-projected", action="store_true")
    args = ap.parse_args()
    ok = check(small=args.small, dtype=args.dtype)
    if not args.skip_projected:
        ok &= check_projected(small=args.small, dtype=args.dtype)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
