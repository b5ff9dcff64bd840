"""Tiny TPU health probe: compiles+runs a small matmul and host-fetches a scalar.

Exit 0 = chip healthy, nonzero = unavailable. Run under `timeout 90` — a hang
at backend init is the hard-outage mode (see NOTES_ROUND2.md).
"""
import os
import sys


def main() -> int:
    # The axon plugin ignores the JAX_PLATFORMS env var (see tests/conftest.py)
    # — if the caller pinned a non-TPU platform there is nothing to probe, and
    # importing jax here would hang at axon init during an outage.
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "tpu" not in plat and "axon" not in plat:
        print(f"probe: non-TPU platform pinned ({plat})", flush=True)
        return 2
    try:
        import jax
        import jax.numpy as jnp

        if jax.default_backend() not in ("tpu", "axon"):
            print(f"probe: backend={jax.default_backend()} (no TPU)", flush=True)
            return 2
        x = jnp.ones((256, 256), jnp.bfloat16)
        val = float(jnp.dot(x, x).sum())  # host fetch = real round trip
        print(f"probe: ok backend={jax.default_backend()} val={val}", flush=True)
        return 0
    except Exception as e:  # noqa: BLE001
        print(f"probe: unavailable ({type(e).__name__}: {e})"[:300], flush=True)
        return 1


if __name__ == "__main__":
    sys.exit(main())
