"""RTT-calibrated wall-clock timing for single-chip benchmarks.

The axon TPU tunnel costs a FIXED ~26 ms host<->device round-trip per
device call, independent of the work inside (measured: an empty 1/10/100-
iteration lax.scan all take ~26.1-26.7 ms). Benchmarks that amortize over n
scan iterations therefore over-report every step by rtt/n — at n=10 that is
~2.6 ms/step, which swamps small stages (a bs=1 inference step is ~5 ms).

`calibrate_rtt()` measures the fixed per-call cost once (empty-body scan);
`timed_call()` subtracts it from each timed call before dividing by n. The
residual error is the RTT jitter (~0.3 ms) divided by n.
"""
import time


def calibrate_rtt(n: int = 10, reps: int = 3) -> float:
    """Fixed per-device-call overhead in seconds (min over reps)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def empty(x):
        def body(c, _):
            return c + x.ravel()[0] * 1e-12, ()
        c, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return c

    x = jnp.ones((8, 128))
    float(empty(x))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(empty(x))
        best = min(best, time.perf_counter() - t0)
    return best


def timed_scan(fn, args, n: int, rtt: float, consume: str = "elem",
               reps: int = 2) -> float:
    """Canonical DCE-proof scan harness: per-iteration seconds of
    fn(*args), RTT-subtracted (raw — possibly <= 0 below the noise floor).

    Builds the jitted n-iteration `lax.scan` with the full measurement
    discipline (PERF.md Methodology) in ONE place:
      * every inexact input leaf is perturbed by the carry (else XLA
        hoists non-dependent compute out of the scan);
      * outputs are consumed per `consume`: "elem" takes one element of
        EVERY leaf (multi-op stages — sibling outputs stay alive),
        "sum" reduces every leaf fully (single-op microbenches — blocks
        the slice-pushdown that otherwise shrinks a lone conv/gather to
        one output element).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(args):
        def body(carry, _):
            perturbed = jax.tree.map(
                lambda leaf: leaf + carry.astype(leaf.dtype) * 1e-12
                if jnp.issubdtype(leaf.dtype, jnp.inexact) else leaf,
                args,
            )
            out = fn(*perturbed)
            acc = jnp.float32(0)
            for leaf in jax.tree.leaves(out):
                if consume == "sum":
                    acc = acc + leaf.sum().astype(jnp.float32)
                else:
                    acc = acc + leaf.ravel()[0].astype(jnp.float32)
            return carry + acc * 1e-12, ()

        c, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return c

    return timed_call(run, args, n, rtt, reps)


def timed_call(run, args, n: int, rtt: float, reps: int = 2) -> float:
    """Per-iteration seconds of `run(args)` (a compiled n-iteration scan),
    with the fixed per-call RTT subtracted. Takes the min over reps.

    Returns the RAW subtracted value — possibly <= 0 when the whole call
    lands under the RTT noise floor (advisor r4: a silent max(..., 0)
    clamp made genuinely-sub-noise stages indistinguishable from
    over-subtracted ones). Callers should treat values <= 0 (or within
    ~rtt jitter/n of 0) as below-noise-floor and either increase n or
    flag the stage rather than report 0.0 as a measurement."""
    float(run(args))  # warm (compile on first use)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    return (best - rtt) / n
