"""On-device ODE solvers for flow-matching sampling and inversion.

The reference integrates the learned velocity field with host-side
``torchdiffeq`` (`/root/reference/flow_matching.py:8,130-180`): fixed-step
euler/midpoint/rk4 (``options.step_size``), adaptive dopri5/bosh3/
adaptive_heun (rtol=atol=1e-5), and a "fixadp" composition that is
fixed-step on [0, t_mid] and adaptive on [t_mid, 1].

Here every solver compiles to a single XLA program:

- fixed-step methods are a ``lax.scan`` over a precomputed time grid, so the
  entire 50/100-NFE sampling loop is one device launch; the scan can also
  stack per-step auxiliary outputs (activation captures for u-space editing
  reads — the TPU-native replacement for the reference's per-step
  ``np.save`` inside the forward pass, `libs/dissection.py:126-137`);
- adaptive methods are a ``lax.while_loop`` with a PI step controller and
  static iteration cap (no adjoint machinery: the reference passes
  ``adjoint_params=()`` and never differentiates through sampling).

Velocity-field signature: ``vf(t, x) -> dx/dt`` with scalar ``t``; or
``vf(t, x) -> (dx/dt, aux)`` when ``has_aux=True`` (fixed-step only).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array

_RTOL = 1e-5  # reference defaults, flow_matching.py:11-12
_ATOL = 1e-5

# ---------------------------------------------------------------------------
# Fixed-step methods (lax.scan)
# ---------------------------------------------------------------------------


def _wrap_no_aux(vf):
    def vf_aux(t, x):
        return vf(t, x), None

    return vf_aux


def odeint_fixed(
    vf: Callable,
    x0: Any,
    t0: float,
    t1: float,
    num_steps: int,
    method: str = "euler",
    has_aux: bool = False,
    unroll: int = 1,
):
    """Integrate ``dx/dt = vf(t, x)`` from t0 to t1 in ``num_steps`` equal steps.

    Supports reverse time (t1 < t0) for exact inversion
    (reference ``CNF.encode``, flow_matching.py:102-125).

    Returns ``x(t1)``; with ``has_aux=True``, returns ``(x(t1), stacked_aux)``
    where aux comes from the *first* velocity evaluation of each step (the
    tap point the reference records at, one save per ODE step).
    """
    if method not in ("euler", "midpoint", "rk4"):
        raise NotImplementedError(f"fixed-step method {method!r}")
    vf_aux = vf if has_aux else _wrap_no_aux(vf)
    dt = (t1 - t0) / num_steps
    ts = t0 + dt * jnp.arange(num_steps, dtype=jnp.float32)

    def step(x, t):
        k1, aux = vf_aux(t, x)
        if method == "euler":
            dx = k1
        elif method == "midpoint":
            k2, _ = vf_aux(t + dt / 2, jax.tree.map(lambda a, b: a + (dt / 2) * b, x, k1))
            dx = k2
        else:  # rk4 (classic)
            k2, _ = vf_aux(t + dt / 2, jax.tree.map(lambda a, b: a + (dt / 2) * b, x, k1))
            k3, _ = vf_aux(t + dt / 2, jax.tree.map(lambda a, b: a + (dt / 2) * b, x, k2))
            k4, _ = vf_aux(t + dt, jax.tree.map(lambda a, b: a + dt * b, x, k3))
            dx = jax.tree.map(
                lambda a, b, c, d: (a + 2 * b + 2 * c + d) / 6.0, k1, k2, k3, k4
            )
        x_next = jax.tree.map(lambda a, b: a + dt * b, x, dx)
        return x_next, aux

    x1, auxs = lax.scan(step, x0, ts, unroll=unroll)
    if has_aux:
        return x1, auxs
    return x1


# ---------------------------------------------------------------------------
# Adaptive Runge–Kutta methods (lax.while_loop)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _Tableau:
    """Explicit embedded RK tableau (c, a, b_high, b_err)."""

    order: int  # order used for step-size control exponent
    c: tuple
    a: tuple  # lower-triangular rows, row i has i entries
    b: tuple  # 5th (high) order weights
    b_err: tuple  # b_high - b_low, for the error estimate
    fsal: bool  # first-same-as-last


# Dormand–Prince 5(4) — the torchdiffeq "dopri5" default.
_DOPRI5 = _Tableau(
    order=5,
    c=(0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0),
    a=(
        (),
        (1 / 5,),
        (3 / 40, 9 / 40),
        (44 / 45, -56 / 15, 32 / 9),
        (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
        (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
        (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
    ),
    b=(35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0),
    b_err=(
        35 / 384 - 1951 / 21600,
        0.0,
        500 / 1113 - 22642 / 50085,
        125 / 192 - 451 / 720,
        -2187 / 6784 - -12231 / 42400,
        11 / 84 - 649 / 6300,
        -1.0 / 60.0,
    ),
    fsal=True,
)

# Bogacki–Shampine 3(2) — torchdiffeq "bosh3".
_BOSH3 = _Tableau(
    order=3,
    c=(0.0, 1 / 2, 3 / 4, 1.0),
    a=((), (1 / 2,), (0.0, 3 / 4), (2 / 9, 1 / 3, 4 / 9)),
    b=(2 / 9, 1 / 3, 4 / 9, 0.0),
    b_err=(2 / 9 - 7 / 24, 1 / 3 - 1 / 4, 4 / 9 - 1 / 3, -1 / 8),
    fsal=True,
)

# Heun–Euler 2(1) — torchdiffeq "adaptive_heun".
_HEUN = _Tableau(
    order=2,
    c=(0.0, 1.0),
    a=((), (1.0,)),
    b=(1 / 2, 1 / 2),
    b_err=(1 / 2 - 1.0, 1 / 2),
    fsal=False,
)

_TABLEAUS = {"dopri5": _DOPRI5, "bosh3": _BOSH3, "adaptive_heun": _HEUN}


def _rms_norm(tree) -> Array:
    leaves = jax.tree.leaves(tree)
    sq = sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
    n = sum(l.size for l in leaves)
    return jnp.sqrt(sq / n)


def _error_ratio(err, x0, x1, rtol, atol) -> Array:
    def scale(e, a, b):
        tol = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        return e.astype(jnp.float32) / tol

    return _rms_norm(jax.tree.map(scale, err, x0, x1))


def _initial_step(vf, t0, x0, f0, direction, order, rtol, atol):
    """Hairer/Wanner initial step heuristic (torchdiffeq `_select_initial_step`)."""

    def scale_of(x):
        return jax.tree.map(lambda a: atol + rtol * jnp.abs(a), x)

    sc = scale_of(x0)
    d0 = _rms_norm(jax.tree.map(lambda a, s: a / s, x0, sc))
    d1 = _rms_norm(jax.tree.map(lambda a, s: a / s, f0, sc))
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    x1 = jax.tree.map(lambda a, b: a + direction * h0 * b, x0, f0)
    f1 = vf(t0 + direction * h0, x1)
    d2 = _rms_norm(jax.tree.map(lambda a, b, s: (a - b) / s, f1, f0, sc)) / h0
    h1 = jnp.where(
        jnp.maximum(d1, d2) <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / order),
    )
    return jnp.minimum(100.0 * h0, h1)


def odeint_adaptive(
    vf: Callable,
    x0: Any,
    t0: float,
    t1: float,
    method: str = "dopri5",
    rtol: float = _RTOL,
    atol: float = _ATOL,
    max_steps: int = 4096,
    safety: float = 0.9,
    ifactor: float = 10.0,
    dfactor: float = 0.2,
    controller: str = "i",
    pcoeff: float = 0.4,
    icoeff: float = 0.7,
    return_stats: bool = False,
    stage_delta: Optional[Tuple[Callable, Callable]] = None,
    stage_unroll: bool = True,
):
    """Adaptive embedded-RK integration, entirely on-device via
    ``lax.while_loop`` with a static ``max_steps`` cap.

    ``controller="i"`` matches torchdiffeq's classic integral rule:
    accept when the scaled RMS error ratio <= 1; next step =
    h * clip(safety * ratio^(-1/order), dfactor, ifactor).

    ``controller="pi"`` uses the Hairer/Soderlind
    proportional-integral rule ``h *= safety * ratio^(-icoeff/order) *
    ratio_prev^(pcoeff/order)`` (ratio_prev from the last *accepted*
    step). Same acceptance test — the solution still satisfies the
    tolerance. PI damps the step-size dynamics: it cuts rejections on
    stiff-ish error histories, but on a smooth flow with zero
    rejections the damping also slows step GROWTH (measured on the
    U-ViT-large field: NFE 200 vs 110 for the classic I rule — bench.py
    uses "i"). torchdiffeq has no PI option; pick per field.

    ``return_stats=True`` also returns ``{"steps", "accepted", "nfe"}``
    (nfe counts actual vf evaluations, including the 2 spent by the
    initial-step heuristic).

    ``stage_delta=(vf_base, vf_delta)`` enables BASE-ANCHORED
    STAGE-DELTA evaluation — the mechanism that lets an int8-quantized
    field run under adaptive step control without inflating NFE
    (docs/scaling.md). Signatures: ``vf_base(t, x) -> (f, cache)`` (a
    full evaluation that also emits the per-layer linear-projection
    outputs) and ``vf_delta(t, x, cache) -> f`` (reconstructs each
    projection as ``cached + W @ quantize(input - cached_input)``).
    Within one RK step, stage 2 runs ``vf_base`` (fresh cache, outside
    the stage scan) and stages 3..s run ``vf_delta`` anchored at that
    cache — READ-ONLY, a loop-invariant of the stage scan, so delta
    stages pay no cache-write bandwidth; stage 1 is the FSAL value
    carried from the previous step. Why this tames the error estimate:
    RK stage points are O(h) apart, so the delta operands have
    amplitude ~h and their per-stage rounding noise scales as h
    (vanishing under step control), while the base evaluation's
    rounding error is SHARED by every stage through the cache and the
    embedded-error weights sum to zero — it cancels in the error
    estimate. Dynamic per-row quantization of full activations instead
    re-rounds independently per stage: that noise has a fixed floor
    and drives NFE 110 -> 194 (hybrid int8 MLP view) or ~300 (full
    W8A8) at rtol=atol=1e-5 on the U-ViT-large field. Measured on the
    tiny-model CPU A/B, base-anchoring and stage-to-stage chaining
    give identical NFE (44 == the bf16 field's 44, zero rejections);
    anchoring is the one that needs no per-stage cache emission.
    ``vf`` is ignored when ``stage_delta`` is given.

    ``stage_unroll`` (stage-delta solves only) selects how stages 3..s
    run inside the RK step: ``True`` (default) unrolls them as a
    static Python loop — the cache stays a loop-invariant closure
    constant and the stacked-k dynamic-update-slice chain disappears;
    ``False`` keeps the ``lax.scan`` formulation, which makes the
    multi-GB cache a scan operand (measured ~120 ms/stage of
    copy/relayout on the U-ViT-large TPU solve). The two produce the
    same step sequence (identical NFE); solutions differ only by f32
    summation order in the stage contraction
    (tests/test_delta_field.py pins both, fast variant at rtol=1e-3).
    """
    tab = _TABLEAUS[method]
    n_stage = len(tab.c)
    t0 = jnp.asarray(t0, jnp.float32)
    t1 = jnp.asarray(t1, jnp.float32)
    direction = jnp.sign(t1 - t0)

    # dense tableau: the stage recursion runs as a lax.scan so the (big)
    # velocity field is traced ONCE into the loop body instead of once
    # per stage — a ~6x smaller HLO for dopri5 over a 21-block denoiser,
    # which cuts XLA compile time from tens of minutes to minutes at the
    # bench shape. A is lower-triangular; un-filled k-slots are zeros so
    # the dense row contraction is exact.
    A_np = np.zeros((n_stage, n_stage), np.float32)
    for i in range(1, n_stage):
        A_np[i, : len(tab.a[i])] = tab.a[i]
    A = jnp.asarray(A_np)
    c_nodes = jnp.asarray(tab.c, jnp.float32)
    b_high = jnp.asarray(tab.b, jnp.float32)
    b_err = jnp.asarray(tab.b_err, jnp.float32)

    # inner jit: the velocity field still has three call sites (f0, the
    # initial-step probe, the stage scan) — as a pjit sub-computation its
    # body is traced/lowered once and shared, instead of inlined thrice
    # (big lowering-time win for deep denoisers on slow-compile backends)
    vf_base = vf_delta = None
    if stage_delta is not None:
        vf_base = jax.jit(stage_delta[0])
        vf_delta = jax.jit(stage_delta[1])
        vf = jax.jit(lambda t, x: vf_base(t, x)[0])  # cache DCE'd here
        f0 = vf(t0, x0)
    else:
        vf = jax.jit(vf)
        f0 = vf(t0, x0)
    h0 = _initial_step(vf, t0, x0, f0, direction, tab.order, rtol, atol)

    def _contract(w, ks):
        """sum_j w[j] * ks[j] over the stacked stage axis."""
        return jax.tree.map(
            lambda kk: jnp.tensordot(w, kk.astype(jnp.float32), axes=(0, 0)
                                     ).astype(kk.dtype), ks)

    def rk_step(t, x, f_first, h):
        """One embedded RK step of signed size h*direction."""
        hs = h * direction
        ks0 = jax.tree.map(
            lambda f: jnp.zeros((n_stage,) + f.shape, f.dtype).at[0].set(f),
            f_first)

        if stage_delta is not None:
            # stage 2: fresh base evaluation OUTSIDE the scan (it only
            # depends on k1, and hoisting it removes a lax.cond whose
            # two branches would each materialize the multi-GB cache —
            # the re-anchoring each step also prevents the random-walk
            # solution drift an unbounded delta chain accumulates);
            # stages 3..s: delta evals anchored at the read-only cache,
            # a loop-invariant closure constant of the stage scan
            x2 = jax.tree.map(lambda a, b: a + hs * A[1, 0] * b, x,
                              jax.tree.map(lambda kk: kk[0], ks0))
            k2, cache = vf_base(t + c_nodes[1] * hs, x2)
            if stage_unroll:
                # stages 3..s UNROLLED (list of k's, static tableau
                # coefficients). The lax.scan variant makes the multi-GB
                # cache a scan operand and the stacked-ks carry a
                # dynamic-update-slice chain; measured on the U-ViT-large
                # TPU solve that cost ~120 ms of copy/relayout PER DELTA
                # STAGE (~200 ms/stage in-solve vs 78 ms for the same
                # delta evaluation isolated). vf_delta is a jit subcall,
                # so the field body is still traced/lowered once and
                # shared across the 5 call sites — the HLO stays small.
                k_list = [jax.tree.map(lambda kk: kk[0], ks0), k2]
                for i in range(2, n_stage):
                    xi = x
                    for j in range(i):
                        aij = float(A_np[i, j])
                        if aij != 0.0:
                            xi = jax.tree.map(
                                lambda a, b, w=aij: a + hs * w * b,
                                xi, k_list[j])
                    ki = vf_delta(t + c_nodes[i] * hs, xi, cache)
                    k_list.append(ki)
                ks = jax.tree.map(lambda *kk: jnp.stack(kk), *k_list)
            else:
                ks1 = jax.tree.map(lambda kk, kn: kk.at[1].set(kn), ks0,
                                   k2)

                def stage_b(ks, i):
                    xi = jax.tree.map(lambda a, b: a + hs * b, x,
                                      _contract(A[i], ks))
                    ki = vf_delta(t + c_nodes[i] * hs, xi, cache)
                    return jax.tree.map(lambda kk, kn: kk.at[i].set(kn),
                                        ks, ki), None

                ks, _ = lax.scan(stage_b, ks1, jnp.arange(2, n_stage))
        else:
            def stage(ks, i):
                xi = jax.tree.map(lambda a, b: a + hs * b, x,
                                  _contract(A[i], ks))
                ki = vf(t + c_nodes[i] * hs, xi)
                return jax.tree.map(lambda kk, kn: kk.at[i].set(kn),
                                    ks, ki), None

            ks, _ = lax.scan(stage, ks0, jnp.arange(1, n_stage))
        x_new = jax.tree.map(lambda a, b: a + hs * b, x,
                             _contract(b_high, ks))
        err = jax.tree.map(lambda e: hs * e, _contract(b_err, ks))
        f_last = (jax.tree.map(lambda kk: kk[-1], ks) if tab.fsal
                  else vf(t + hs, x_new))
        return x_new, err, f_last

    def cond(state):
        t, x, f, h, r_prev, n, n_acc = state
        return (n < max_steps) & (direction * (t1 - t) > 1e-8)

    def body(state):
        t, x, f, h, r_prev, n, n_acc = state
        # do not overshoot t1
        h = jnp.minimum(h, jnp.abs(t1 - t))
        x_new, err, f_last = rk_step(t, x, f, h)
        ratio = jnp.maximum(_error_ratio(err, x, x_new, rtol, atol), 1e-10)
        accept = ratio <= 1.0
        if controller == "pi":
            factor = safety * jnp.power(ratio, -icoeff / tab.order) \
                * jnp.power(r_prev, pcoeff / tab.order)
        else:
            factor = safety * jnp.power(ratio, -1.0 / tab.order)
        h_next = h * jnp.clip(factor, dfactor, ifactor)
        t_next = jnp.where(accept, t + h * direction, t)
        x_next = jax.tree.map(
            lambda a, b: jnp.where(accept, b, a), x, x_new
        )
        f_next = jax.tree.map(lambda a, b: jnp.where(accept, b, a), f, f_last)
        r_next = jnp.where(accept, ratio, r_prev)
        return (t_next, x_next, f_next, h_next, r_next, n + 1,
                n_acc + accept.astype(jnp.int32))

    state = (t0, x0, f0, h0, jnp.ones((), jnp.float32),
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    _, x_final, _, _, _, n, n_acc = lax.while_loop(cond, body, state)
    if return_stats:
        per_step = n_stage - 1 if tab.fsal else n_stage
        stats = {"steps": n, "accepted": n_acc, "nfe": 2 + per_step * n}
        return x_final, stats
    return x_final


def _stages_device_loop(vfj, vf_params, x0, t0, t1, direction, tab, A,
                        b_high, b_err, rtol, atol, max_steps, safety,
                        ifactor, dfactor, controller, pcoeff, icoeff,
                        return_stats, expected_steps, _contract, init_host):
    """``program="stages_device"``: the controller state (t, h, ratio,
    x, f, counters) lives ON DEVICE and is advanced by a tiny jitted
    update program, so the host can dispatch whole step attempts BLINDLY
    — no per-iteration scalar fetch. Synchronization happens only when
    the host needs to know whether t reached t1: with
    ``expected_steps`` (e.g. from a warmup solve's stats) the first
    ``expected_steps`` attempts are fire-and-forget and only the tail
    polls, giving fixed-step-like pipelining on high-latency backends.

    Attempts past t1 are EXACT no-ops (the clamped step size hits 0:
    x/t/h unchanged, the accept counter gated on h_step > 0), so an
    overestimated ``expected_steps`` costs wasted field evaluations but
    never correctness. The controller math is the f32 on-device twin of
    :func:`odeint_adaptive`'s while_loop body."""
    n_stage = len(tab.c)
    c_nodes = jnp.asarray(tab.c, jnp.float32)
    dirf = jnp.float32(direction)

    @jax.jit
    def dev_pre(t, h):
        # SIGN-AWARE remaining span: unlike the while_loop (whose cond
        # guards stepping), blind attempts have no cond — if f32
        # rounding ever lands t one ulp past t1, |t1 - t| would step
        # FORWARD again and walk away; clamping at 0 makes any overshoot
        # an exact no-op
        return jnp.minimum(h, jnp.maximum(jnp.float32(0.0),
                                          (jnp.float32(t1) - t) * dirf))

    @jax.jit
    def dev_stage(x, t, h_step, w, ci, ks):
        hs = h_step * dirf
        stk = jax.tree.map(lambda *xs: jnp.stack(xs), *ks)
        xi = jax.tree.map(lambda a, b: a + hs * b, x, _contract(w, stk))
        return xi, t + ci * hs

    @jax.jit
    def dev_update(t, h, r_prev, n_d, n_acc, x, f, h_step, ks):
        hs = h_step * dirf
        stk = jax.tree.map(lambda *xs: jnp.stack(xs), *ks)
        x_new = jax.tree.map(lambda a, b: a + hs * b, x,
                             _contract(b_high, stk))
        err = jax.tree.map(lambda e: hs * e, _contract(b_err, stk))
        ratio = jnp.maximum(_error_ratio(err, x, x_new, rtol, atol), 1e-10)
        # same epsilon as the loops' termination test: an attempt whose
        # remaining span is below it is padding, not a real micro-step
        live = h_step > 1e-8
        accept = (ratio <= 1.0) & live
        if controller == "pi":
            factor = safety * jnp.power(ratio, -icoeff / tab.order) \
                * jnp.power(r_prev, pcoeff / tab.order)
        else:
            factor = safety * jnp.power(ratio, -1.0 / tab.order)
        h_next = h_step * jnp.clip(factor, dfactor, ifactor)
        t_next = jnp.where(accept, t + hs, t)
        x_next = jax.tree.map(lambda a, b: jnp.where(accept, b, a), x, x_new)
        r_next = jnp.where(accept, ratio, r_prev)
        f_stage = jax.tree.map(lambda kk: kk[-1], stk)  # fsal last stage
        f_next = jax.tree.map(lambda a, b: jnp.where(accept, b, a),
                              f, f_stage)
        return (t_next, h_next, r_next, n_d + live.astype(jnp.int32),
                n_acc + accept.astype(jnp.int32), x_next, f_next, x_new)

    f, h = init_host(x0)
    t = jnp.float32(t0)
    r = jnp.float32(1.0)
    n_d = n_acc = jnp.int32(0)
    x = x0
    n = 0
    blind = 0 if expected_steps is None else max(0, int(expected_steps))
    while n < max_steps:
        if n >= blind and float(direction * (t1 - float(t))) <= 1e-8:
            break
        h_step = dev_pre(t, h)
        ks = [f] * n_stage
        for i in range(1, n_stage):
            xi, ti = dev_stage(x, t, h_step, A[i], c_nodes[i], ks)
            ks[i] = vfj(ti, xi, vf_params)
        t, h, r, n_d, n_acc, x, f, x_new = dev_update(
            t, h, r, n_d, n_acc, x, f, h_step, tuple(ks))
        if not tab.fsal:
            # recompute f at (t, x): identical to the accepted f_last on
            # accept, and a value-preserving refresh on reject
            f = vfj(t, x, vf_params)
        n += 1
    if return_stats:
        per_step = n_stage - 1 if tab.fsal else n_stage
        steps = int(n_d)
        stats = {"steps": steps, "accepted": int(n_acc),
                 "nfe": 2 + per_step * steps}
        return x, stats
    return x


def odeint_adaptive_host(
    vf: Callable,
    x0: Any,
    t0: float,
    t1: float,
    method: str = "dopri5",
    rtol: float = _RTOL,
    atol: float = _ATOL,
    max_steps: int = 4096,
    safety: float = 0.9,
    ifactor: float = 10.0,
    dfactor: float = 0.2,
    controller: str = "i",
    pcoeff: float = 0.4,
    icoeff: float = 0.7,
    return_stats: bool = False,
    program: str = "fused",
    vf_params: Any = None,
    expected_steps: Optional[int] = None,
    stage_delta: Optional[Tuple[Callable, Callable]] = None,
):
    """Host-driven twin of :func:`odeint_adaptive`: the embedded RK step
    (stage scan + error ratio) is ONE small jitted program invoked from a
    Python loop, with only the accept/step-size controller on the host —
    torchdiffeq's own architecture.

    Same numerics as the device loop (shared tableaus/controller rules).
    Exists because a single giant ``while_loop`` program can exceed what
    a backend's compiler service handles (the axon tunnel's
    remote_compile crashes on dopri5 over a 21-block denoiser), and a
    host loop costs only one scalar fetch per step. Not jittable as a
    whole — use the device loop inside larger compiled programs.

    ``program`` selects how much of the step is fused into one
    executable:

    - ``"fused"`` (default): the full embedded step (stage scan + error
      ratio) is one program — fewest dispatches, but the program still
      contains the velocity field wrapped in a ``scan``/carry structure,
      which some fragile compiler services reject even when the plain
      field compiles.
    - ``"stages"``: the ONLY program containing the velocity field is
      ``jit(vf)`` itself; stage combinations, the error ratio, and the
      initial-step heuristic run as tiny elementwise programs. All
      dispatches are async (device work pipelines); the single
      synchronization per iteration is the error-ratio fetch the
      controller needs. Numerically identical update formulas (f32
      contractions); float summation order differs from the scan
      formulation at the ulp level.

    ``vf_params``: optional parameter pytree threaded through every
    compiled program as an explicit ARGUMENT; when given, the field is
    called as ``vf(t, x, vf_params)``. A top-level host driver cannot
    rely on closure capture at scale: closed-over concrete arrays are
    baked into the executable payload, and a multi-GB parameter tree in
    the program body is exactly what fragile remote-compile services
    choke on (pass-as-argument programs of the same model compile fine).

    ``stage_delta=(vf_base, vf_delta)``: the base-anchored stage-delta
    field (see :func:`odeint_adaptive`), host-stepped —
    ``program="stages"`` only. Signatures take params explicitly:
    ``vf_base(t, x, p) -> (f, cache)`` and
    ``vf_delta(t, x, cache, p) -> f``; within one RK step stage 2 runs
    the base (its cache lives as an ordinary device value between the
    two dispatches) and stages 3..s the delta. ``vf`` is ignored. The
    step sequence matches the device loop's stage-delta path.
    """
    tab = _TABLEAUS[method]
    n_stage = len(tab.c)
    A = np.zeros((n_stage, n_stage), np.float32)
    for i in range(1, n_stage):
        A[i, : len(tab.a[i])] = tab.a[i]
    A = jnp.asarray(A)
    c_nodes = jnp.asarray(tab.c, jnp.float32)
    b_high = jnp.asarray(tab.b, jnp.float32)
    b_err = jnp.asarray(tab.b_err, jnp.float32)
    direction = 1.0 if t1 >= t0 else -1.0

    # normalize the field to vf(t, x, p) with p an explicit ARGUMENT of
    # every compiled program (see ``vf_params`` in the docstring)
    base_j = delta_j = None
    if stage_delta is not None:
        if program != "stages":
            raise NotImplementedError(
                "host stage_delta requires program='stages'")
        base_j = jax.jit(stage_delta[0])   # (t, x, p) -> (f, cache)
        delta_j = jax.jit(stage_delta[1])  # (t, x, cache, p) -> f
        vfj = jax.jit(lambda t, x, p: base_j(t, x, p)[0])  # cache DCE'd
    else:
        vfj = (jax.jit(lambda t, x, p: vf(t, x)) if vf_params is None
               else jax.jit(vf))

    def _contract(w, ks):
        return jax.tree.map(
            lambda kk: jnp.tensordot(w, kk.astype(jnp.float32), axes=(0, 0)
                                     ).astype(kk.dtype), ks)

    @jax.jit
    def rk_step(t, x, f_first, h, p):
        hs = h * direction
        ks0 = jax.tree.map(
            lambda f: jnp.zeros((n_stage,) + f.shape, f.dtype).at[0].set(f),
            f_first)

        def stage(ks, i):
            xi = jax.tree.map(lambda a, b: a + hs * b, x, _contract(A[i], ks))
            ki = vfj(t + c_nodes[i] * hs, xi, p)
            return jax.tree.map(lambda kk, kn: kk.at[i].set(kn), ks, ki), None

        ks, _ = lax.scan(stage, ks0, jnp.arange(1, n_stage))
        x_new = jax.tree.map(lambda a, b: a + hs * b, x,
                             _contract(b_high, ks))
        err = jax.tree.map(lambda e: hs * e, _contract(b_err, ks))
        f_last = (jax.tree.map(lambda kk: kk[-1], ks) if tab.fsal
                  else vfj(t + hs, x_new, p))
        ratio = _error_ratio(err, x, x_new, rtol, atol)
        return x_new, f_last, ratio

    @jax.jit
    def init_fn(x0, p):
        f0 = vfj(jnp.float32(t0), x0, p)
        h0 = _initial_step(lambda t, x: vfj(t, x, p), jnp.float32(t0), x0,
                           f0, direction, tab.order, rtol, atol)
        return f0, h0

    if program in ("stages", "stages_device"):
        # every t passed to vf is a STRONG f32 scalar (np.float32 or a
        # device scalar) so all call sites share one compiled executable
        @jax.jit
        def lin_comb(x, hs, w, ks):
            stk = jax.tree.map(lambda *xs: jnp.stack(xs), *ks)
            return jax.tree.map(lambda a, b: a + hs * b, x,
                                _contract(w, stk))

        @jax.jit
        def finish(x, hs, ks):
            stk = jax.tree.map(lambda *xs: jnp.stack(xs), *ks)
            x_new = jax.tree.map(lambda a, b: a + hs * b, x,
                                 _contract(b_high, stk))
            err = jax.tree.map(lambda e: hs * e, _contract(b_err, stk))
            return x_new, _error_ratio(err, x, x_new, rtol, atol)

        @jax.jit
        def init_h0(x0, f0):
            sc = jax.tree.map(lambda a: atol + rtol * jnp.abs(a), x0)
            d0 = _rms_norm(jax.tree.map(lambda a, s: a / s, x0, sc))
            d1 = _rms_norm(jax.tree.map(lambda a, s: a / s, f0, sc))
            h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
            return h0, d1

        @jax.jit
        def probe_x(x0, f0, h0):
            return jax.tree.map(
                lambda a, b: a + direction * h0 * b, x0, f0)

        @jax.jit
        def init_h1(x0, f0, f1, h0, d1):
            sc = jax.tree.map(lambda a: atol + rtol * jnp.abs(a), x0)
            d2 = _rms_norm(jax.tree.map(
                lambda a, b, s: (a - b) / s, f1, f0, sc)) / h0
            h1 = jnp.where(
                jnp.maximum(d1, d2) <= 1e-15,
                jnp.maximum(1e-6, h0 * 1e-3),
                (0.01 / jnp.maximum(d1, d2)) ** (1.0 / tab.order))
            return jnp.minimum(100.0 * h0, h1)

        def init_host(x0):
            # the Hairer heuristic as vf calls + tiny programs (matches
            # _initial_step term for term)
            f0 = vfj(np.float32(t0), x0, vf_params)
            h0, d1 = init_h0(x0, f0)
            f1 = vfj(jnp.float32(t0) + jnp.float32(direction) * h0,
                     probe_x(x0, f0, h0), vf_params)
            return f0, init_h1(x0, f0, f1, h0, d1)

        def rk_host(t, x, f_first, h):
            """One embedded step; ONLY jit(vf) contains the field."""
            hs = np.float32(h * direction)
            ks = [f_first] * n_stage  # zero tableau weights mask j >= i
            cache = None
            for i in range(1, n_stage):
                xi = lin_comb(x, hs, A[i], tuple(ks))
                ti = np.float32(t + tab.c[i] * h * direction)
                if stage_delta is None:
                    ks[i] = vfj(ti, xi, vf_params)
                elif i == 1:
                    # stage 2: fresh base evaluation anchors the cache
                    ks[i], cache = base_j(ti, xi, vf_params)
                else:
                    ks[i] = delta_j(ti, xi, cache, vf_params)
            x_new, ratio = finish(x, hs, tuple(ks))
            f_last = (ks[-1] if tab.fsal
                      else vfj(np.float32(t + h * direction), x_new,
                               vf_params))
            return x_new, f_last, ratio

        if program == "stages_device":
            return _stages_device_loop(
                vfj, vf_params, x0, t0, t1, direction, tab, A, b_high,
                b_err, rtol, atol, max_steps, safety, ifactor, dfactor,
                controller, pcoeff, icoeff, return_stats, expected_steps,
                _contract, init_host)
    else:
        def init_host(x0):
            return init_fn(x0, vf_params)

        def rk_host(t, x, f_first, h):
            return rk_step(jnp.float32(t), x, f_first, jnp.float32(h),
                           vf_params)

    f, h0 = init_host(x0)
    h = float(h0)
    t, x = float(t0), x0
    r_prev = 1.0
    n = n_acc = 0
    while n < max_steps and direction * (t1 - t) > 1e-8:
        h_step = min(h, abs(t1 - t))
        x_new, f_last, ratio = rk_host(t, x, f, h_step)
        ratio = max(float(ratio), 1e-10)
        accept = ratio <= 1.0
        if controller == "pi":
            factor = safety * ratio ** (-icoeff / tab.order) \
                * r_prev ** (pcoeff / tab.order)
        else:
            factor = safety * ratio ** (-1.0 / tab.order)
        h = h_step * min(max(factor, dfactor), ifactor)
        n += 1
        if accept:
            t += h_step * direction
            x, f = x_new, f_last
            r_prev = ratio
            n_acc += 1
    if return_stats:
        per_step = n_stage - 1 if tab.fsal else n_stage
        stats = {"steps": n, "accepted": n_acc, "nfe": 2 + per_step * n}
        return x, stats
    return x


# ---------------------------------------------------------------------------
# Reference-compatible driver (solver_kwargs surface)
# ---------------------------------------------------------------------------


def num_fixed_steps(t0: float, t1: float, step_size: float) -> int:
    """Static step count for a fixed-step solve (torchdiffeq step grid)."""
    return max(1, int(round(abs(t1 - t0) / step_size)))


def odeint(
    vf: Callable,
    x0: Any,
    t0: float,
    t1: float,
    solver_kwargs: Optional[dict] = None,
    t_mid: Optional[float] = None,
    has_aux: bool = False,
    rtol: float = _RTOL,
    atol: float = _ATOL,
    vf_params: Any = None,
):
    """Dispatch on the reference's ``solver_kwargs`` dict
    (configs/*.py `dissection.solver_kwargs`):

    - ``{"solver": "fixed", "solver_fix": m, "solver_fix_step": s}``
    - ``{"solver": "adaptive", "solver_adaptive": m}``
    - ``{"solver": "fixadp", ...}`` with split point ``t_mid`` — fixed on
      [t0, t_mid], adaptive on [t_mid, t1] (flow_matching.py:153-180).

    Optional keys forwarded to the adaptive solves: ``rtol``/``atol``,
    ``controller``, ``safety`` (0.9 = torchdiffeq default; 1.0 = the
    tuned protocol — same tolerances and accept test, measured zero
    rejections on the U-ViT fields), and ``stage_delta`` (the int8
    base-anchored field pair; see the comment at the read site).

    ``vf_params``: optional parameter pytree; when given the field is
    called as ``vf(t, x, vf_params)``. For the host adaptive driver it
    is threaded as an explicit argument of every compiled program
    (closure capture bakes the tree into the executable payload — see
    :func:`odeint_adaptive_host`); the in-graph solvers (fixed/device
    adaptive), which callers jit with params already as arguments, just
    bind it.
    """
    sk = dict(solver_kwargs or {"solver": "adaptive", "solver_adaptive": "dopri5"})
    kind = sk.get("solver", "adaptive")
    rtol = sk.get("rtol", rtol)
    atol = sk.get("atol", atol)
    controller = sk.get("controller", "i")
    safety = sk.get("safety", 0.9)
    # stage_delta: (vf_base, vf_delta) pair (core/delta_field.py) for
    # the adaptive part of the solve — the int8 field that holds NFE
    # parity with bf16 under step control. Callables can't live in an
    # ml_collections config; config-driven callers set the string knob
    # ``field="stage_delta_int8"`` instead and the sampling layer
    # (train/loop.py sample_latents) builds the pair from the model.
    stage_delta = sk.get("stage_delta")
    host = kind != "fixed" and sk.get("driver") == "host"
    if vf_params is not None and not host:
        # in-graph solvers: bind the tree (callers jit these solves with
        # params as arguments, so the binding is a traced value there)
        base_vf, p = vf, vf_params
        vf = lambda t, x: base_vf(t, x, p)
    if kind == "fixed":
        n = num_fixed_steps(t0, t1, sk.get("solver_fix_step", 0.01))
        return odeint_fixed(
            vf, x0, t0, t1, n, method=sk.get("solver_fix", "euler"), has_aux=has_aux
        )
    if has_aux:
        raise ValueError("activation capture requires a fixed-step solver")
    if kind == "adaptive":
        if host:
            # host-path stage-delta callables are param-threaded:
            # (vf_base(t, x, p), vf_delta(t, x, cache, p))
            return odeint_adaptive_host(
                vf, x0, t0, t1, method=sk.get("solver_adaptive", "dopri5"),
                rtol=rtol, atol=atol, controller=controller,
                safety=safety, program=sk.get("program", "fused"),
                vf_params=vf_params, stage_delta=stage_delta,
            )
        return odeint_adaptive(
            vf, x0, t0, t1, method=sk.get("solver_adaptive", "dopri5"),
            rtol=rtol, atol=atol, controller=controller, safety=safety,
            stage_delta=stage_delta,
        )
    if kind == "fixadp":
        if t_mid is None:
            raise ValueError("fixadp requires t_mid (reference uses t_edit)")
        n = num_fixed_steps(t0, t_mid, sk.get("solver_fix_step", 0.01))
        x_mid = odeint_fixed(
            vf, x0, t0, t_mid, n, method=sk.get("solver_fix", "euler")
        )
        return odeint_adaptive(
            vf, x_mid, t_mid, t1, method=sk.get("solver_adaptive", "dopri5"),
            rtol=rtol, atol=atol, controller=controller, safety=safety,
            stage_delta=stage_delta,
        )
    raise NotImplementedError(f"solver={kind!r}")
