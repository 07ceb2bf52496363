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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/qagnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from qagnn_tpu.ops.gat_attention import relational_gat_attention_nodes

    assert jax.default_backend() == "tpu", (
        f"this check targets the real chip; got {jax.default_backend()}")

    if args.small:
        G, N, E, HD, H = 4, 16, 64, 32, 2
    else:
        G, N, E, HD, H = 8, 200, 4096, 200, 4
    dph = HD // H
    cdt = getattr(jnp, args.dtype)

    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), cdt)
    nq, nk, nm = f(G, N, HD), f(G, N, HD), f(G, N, HD)
    ekb, emb = f(G, E, HD), f(G, E, HD)
    skb, smb = f(G, N, HD), f(G, N, HD)
    src = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
    dst = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
    mask = jnp.asarray(rng.random((G, E)) > 0.25, bool)

    def run(backend):
        r = lambda t: t.reshape(t.shape[0], t.shape[1], H, dph)

        @jax.jit
        def loss(diff):
            nq, nk, nm, ekb, emb, skb, smb = diff
            out = relational_gat_attention_nodes(
                r(nq), r(nk), r(nm), r(ekb), r(emb), r(skb), r(smb),
                src, dst, mask, backend=backend)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        diff = (nq, nk, nm, ekb, emb, skb, smb)
        val, grads = jax.value_and_grad(loss)(diff)
        return float(val), [np.asarray(g, np.float32) for g in grads]

    v_oh, g_oh = run("onehot")
    v_pl, g_pl = run("pallas")

    ok = True
    rel_v = abs(v_pl - v_oh) / max(abs(v_oh), 1e-9)
    print(f"forward loss: onehot={v_oh:.6g} pallas={v_pl:.6g} rel={rel_v:.2e}")
    ok &= rel_v < 2e-2
    names = ["dnq", "dnk", "dnm", "dekb", "demb", "dskb", "dsmb"]
    for name, a, b in zip(names, g_pl, g_oh):
        scale = max(np.abs(b).max(), 1e-6)
        rel = np.abs(a - b).max() / scale
        print(f"{name}: max_rel_vs_peak={rel:.2e}")
        ok &= rel < 5e-2
    print("PARITY " + ("OK" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
