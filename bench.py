"""Benchmark entry point (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.json): wall-clock speedup solving the
n=100,000, k~5 sparse LAP versus the sequential CPU reference engine
(the Rust crate's stand-in, see BASELINE.md).  The TPU framework runs
the heterogeneous solve: ε-scaled TPU bulk rounds + native chain tails,
reaching the identical ε-optimality certificate.  vs_baseline is the
speedup factor (>1 = faster than the reference).

Also measured and logged to stderr: batched 256x256 throughput (north
star: >10k instances/sec).
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _cache_dir():
    import os

    return os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"),
    )


def _cache_entries():
    """Filenames currently in the persistent compilation cache."""
    import os

    try:
        return set(os.listdir(_cache_dir()))
    except OSError:
        return set()


def _cache_report(label, before):
    """Log how many programs the phase compiled fresh (= cache misses).

    The persistent cache writes a file only on a compile that missed, so
    new-files-since-snapshot is an exact miss count for programs above
    the 1 s min-compile-time threshold.  Round-3 driver forensics: all
    197 entries carried the driver session's own mtimes -> the driver
    started with an EMPTY cache (it was gitignored, never committed) and
    paid the full 393 s cold start.  This instrumentation makes that
    failure mode loud in the artifact (VERDICT round 3, item 2).
    """
    after = _cache_entries()
    new = after - before
    if new:
        by_prog = {}
        for f in new:
            by_prog[f.split("-")[0]] = by_prog.get(f.split("-")[0], 0) + 1
        progs = ", ".join(f"{k} x{v}" for k, v in sorted(by_prog.items()))
        log(f"cache[{label}]: {len(new)} MISS(es) compiled fresh "
            f"({progs}); {len(after)} entries now")
    else:
        log(f"cache[{label}]: all hits ({len(after)} entries)")
    return after


def require_live_backend(attempts=6, probe_timeout=240, retry_wait=180):
    """Fail loudly (exit 1) instead of hanging when the TPU tunnel is down.

    The axon backend's ``make_c_api_client`` blocks indefinitely when the
    tunnel is unreachable (observed 2026-08-17: >12 min with zero
    progress).  An in-process init cannot be timed out (it holds the
    GIL inside a C call), so probe in a killable subprocess first and
    only import jax here once a probe succeeds.  Retries cover
    transient tunnel restarts; a persistent outage exits nonzero with a
    clear message rather than wedging the driver with no JSON line.

    probe_timeout budgets client init + one tiny matmul compile, NOT a
    library compile — a healthy-but-slow day measured ~10–40 s of init;
    240 s leaves wide margin so a slow tunnel is not declared dead.

    Returns True when the backend answered, False after all probes
    failed (the caller then runs the degraded CPU-only headline instead
    of losing the round's record entirely).
    """
    import subprocess

    probe = (
        "import jax, jax.numpy as jnp, numpy as np\n"
        "x = jnp.ones((128, 128))\n"
        "print('BACKEND_OK', float(np.asarray(x @ x)[0, 0]))\n"
    )
    for i in range(attempts):
        t0 = time.perf_counter()
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                timeout=probe_timeout, text=True,
            )
            if "BACKEND_OK" in out.stdout:
                log(f"backend probe ok in {time.perf_counter() - t0:.1f}s")
                return True
            log(f"backend probe failed (attempt {i + 1}/{attempts}): "
                f"{(out.stderr or out.stdout).strip()[-200:]}")
        except subprocess.TimeoutExpired:
            log(f"backend probe hung >{probe_timeout}s "
                f"(attempt {i + 1}/{attempts}) — tunnel down?")
        if i + 1 < attempts:
            time.sleep(retry_wait)
    log("WARNING: accelerator backend unreachable after "
        f"{attempts} probes — falling back to the DEGRADED CPU-only "
        "headline (framework default engine, no TPU)")
    return False


def bench_headline_degraded(n=100_000, repeats=3):
    """Tunnel-outage fallback: the framework's default `solve()` vs the
    sequential CPU reference, no accelerator involved.

    `solve(engine="auto")` routes plain sparse singles to the native
    ε-ladder engine (the measured-fastest correct engine for this
    instance class — see docs/PERFORMANCE.md auto-router notes), so
    this is exactly what a user of the framework gets on this instance;
    it just exercises none of the TPU path.  Logged loudly as degraded
    so the record cannot be mistaken for a hardware run.

    The jax platform is forced to CPU before the package import:
    during an outage the axon plugin hangs any process that touches the
    default backend (docs/PERFORMANCE.md round-3 fifth session).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    from sparse_linear_assignment_tpu import KhoslaSolver
    from sparse_linear_assignment_tpu.cpu_reference import khosla_solve_cpu
    from sparse_linear_assignment_tpu.generators import gen_symmetric_input

    solver, solution = KhoslaSolver.new(n, n, 10 * n)
    gen_symmetric_input(solver, 42, n, 5.0 / n, 0.0, 10.0)
    ref = KhoslaSolver.new(n, n, 10 * n)[0]
    gen_symmetric_input(ref, 42, n, 5.0 / n, 0.0, 10.0)

    t0 = time.perf_counter()
    cpu_sol, cpu_nits = khosla_solve_cpu(ref)
    cpu_time = time.perf_counter() - t0
    cpu_obj = ref.get_objective(cpu_sol)
    log(f"CPU reference: {cpu_time:.2f}s nits={cpu_nits} obj={cpu_obj:.2f}")

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        solver.solve(solution, False)  # engine="auto" -> native ladder
        times.append(time.perf_counter() - t0)
        log(f"default solve() repeat {i}: {times[-1]:.3f}s")
    best = min(times)
    obj = solver.get_objective(solution)
    assert solution.num_unassigned == 0
    assert abs(obj - cpu_obj) <= n * solution.eps + 1e-6, (obj, cpu_obj)
    log(f"DEGRADED headline (no TPU): default solve() {best:.3f}s vs "
        f"reference {cpu_time:.2f}s = {cpu_time / best:.1f}x")
    return cpu_time / best


def bench_headline():
    """n=1e5 k~5 sparse LAP: sequential CPU reference vs hybrid TPU.

    The first hybrid solve (compile / persistent-cache load — the
    910 s worst case of BENCH_r02) runs in a background thread
    OVERLAPPED with the 50 s sequential CPU reference (both release
    the GIL: the native engine in its C call, the compile in its RPC
    to the remote compiler), so the cold-start cost mostly disappears
    from the wall clock; it is still measured and logged honestly.
    """
    import threading

    from sparse_linear_assignment_tpu import KhoslaSolver
    from sparse_linear_assignment_tpu.cpu_reference import khosla_solve_cpu
    from sparse_linear_assignment_tpu.generators import gen_symmetric_input

    n = 100_000
    solver, solution = KhoslaSolver.new(n, n, 10 * n)
    t0 = time.perf_counter()
    gen_symmetric_input(solver, 42, n, 5.0 / n, 0.0, 10.0)
    log(f"headline gen: {time.perf_counter() - t0:.1f}s "
        f"({solver.num_of_arcs()} arcs)")

    # prewarm: first hybrid solve in a thread (compiles + caches every
    # program of the timed path), overlapped with the CPU reference
    solver.dtype = np.dtype(np.float32)
    warm_sol = type(solution).new()
    warm = {}

    def prewarm():
        t0 = time.perf_counter()
        solver.solve(warm_sol, False, scale_eps=True, hybrid=True)
        warm["first"] = time.perf_counter() - t0

    th = threading.Thread(target=prewarm)
    th.start()

    # CPU reference (sequential Khosla, the Rust crate's semantics).
    # Build a second solver so the reference run does not race the
    # prewarm thread's use of the staged problem.  The prewarm's own
    # native chain tails briefly share this single-core host (~0.5 s of
    # CPU inside the reference's ~50 s window, <1% inflation — accepted
    # for the wall-clock win of overlapping the compile).
    ref = KhoslaSolver.new(n, n, 10 * n)[0]
    gen_symmetric_input(ref, 42, n, 5.0 / n, 0.0, 10.0)

    def cpu_run(i):
        t0 = time.perf_counter()
        cpu_sol, cpu_nits = khosla_solve_cpu(ref)
        dt = time.perf_counter() - t0
        obj = ref.get_objective(cpu_sol)
        log(f"CPU reference run {i}: {dt:.2f}s nits={cpu_nits} "
            f"unassigned={cpu_sol.num_unassigned} obj={obj:.2f}")
        return dt, obj

    cpu_times = []
    dt, cpu_obj = cpu_run(0)
    cpu_times.append(dt)

    th.join()
    log(f"hybrid first (incl compile/cache load, overlapped with the "
        f"CPU reference): {warm['first']:.2f}s")

    # timed: 5 hybrid repeats INTERLEAVED with 2 more CPU-reference
    # runs (3 total), so both sides sample the same thermal window of
    # this single-core host; the headline is median/median.  Round-3
    # forensics: a single CPU-reference wall swung 49.6–58.6 s between
    # sessions (±18% of the reported speedup from the denominator
    # alone) while the TPU side was already median-of-5 — VERDICT
    # round 3 item 3; reference protocol: criterion's repeated-run
    # medians (/root/reference/benches/benchmark.rs:111-125).
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        solver.solve(solution, False, scale_eps=True, hybrid=True)
        times.append(time.perf_counter() - t0)
        log(f"hybrid repeat {i}: {times[-1]:.2f}s")
        if i in (1, 3):
            cpu_times.append(cpu_run(len(cpu_times))[0])
    best = min(times)
    median = sorted(times)[len(times) // 2]
    cpu_median = sorted(cpu_times)[len(cpu_times) // 2]
    tpu_obj = solver.get_objective(solution)
    log(f"hybrid steady best: {best:.2f}s median: {median:.2f}s "
        f"unassigned={solution.num_unassigned} obj={tpu_obj:.2f}")
    log(f"CPU reference walls: "
        + ", ".join(f"{t:.2f}s" for t in cpu_times)
        + f" median: {cpu_median:.2f}s")
    # Both must reach a full matching; objectives agree within the n*eps
    # optimality bound.  Certificate note: the hybrid's bulk phase runs
    # float32, so its eps-CS certificate holds within f32 rounding of
    # prices (~C*2^-23); the strict f64 certificate is available via
    # solver.dtype = float64 at a measured 2.1x cost
    # (docs/PERFORMANCE.md "dtype/eps decision matrix").
    assert solution.num_unassigned == 0
    assert abs(tpu_obj - cpu_obj) <= n * solution.eps + 1e-6, (tpu_obj, cpu_obj)
    log(f"headline: median CPU {cpu_median:.2f}s / median TPU "
        f"{median:.2f}s = {cpu_median / median:.1f}x "
        f"(best-of-5 TPU would read {cpu_median / best:.1f}x)")
    return cpu_median / median


def bench_batched(batch=4096, repeats=5, staged_copies=3):
    """Batched 256×256 throughput on the forward-reverse engine,
    device-resident end-to-end.

    Inputs are GENERATED on the device (seeded jax PRNG) and the solve
    runs in device-resident mode (``costs=None``): no host costs, the
    objective rides the single packed readback, stragglers finish with
    on-device continuation.  Generation plays the role of the reference
    bench's excluded setup phase (criterion iter_batched,
    `benchmark.rs:111-125` — staging/ingress is setup, the timed region
    is the full solve including result readback); it also removes the
    ~2-minute tunnel-ingress tax of shipping GBs of random matrices,
    letting the bench run production-sized batches.  A few distinct
    staged batches cycle across the repeats (fresh inputs per repeat).
    """
    import jax
    import jax.numpy as jnp
    from sparse_linear_assignment_tpu.batch import solve_batch

    n = 256

    @jax.jit
    def gen(key):
        return jax.random.randint(
            key, (batch, n, n), 1, 1000, dtype=jnp.int32
        ).astype(jnp.float32)

    t0 = time.perf_counter()
    keys = jax.random.split(jax.random.PRNGKey(0), staged_copies)
    staged = [gen(k) for k in keys]
    jax.block_until_ready(staged)
    log(f"batched on-device generation: {staged_copies}x{batch}x{n}x{n} "
        f"in {time.perf_counter() - t0:.1f}s (setup, excluded — "
        f"criterion-iter_batched protocol)")
    staged = [staged[i % staged_copies] for i in range(repeats)]

    # the generated costs are integers in [1, 1000): run the
    # integer-auction mode (scaled-int32 lattice, exact packed
    # selection keys — measured ~9% faster e2e and bit-exact by
    # construction); device-resident inputs need the explicit opt-in
    # plus max_cost (a device max would cost a tunnel readback)
    t0 = time.perf_counter()
    sol = solve_batch(None, solver="fr", dtype=np.float32,
                      costs_device=staged[0], integer=True, max_cost=1000)
    log(f"batched compile+first: {time.perf_counter() - t0:.1f}s "
        f"unassigned={int(sol.num_unassigned.sum())}")
    import sparse_linear_assignment_tpu.batch as batch_mod

    rates = []
    for dev in staged:
        t0 = time.perf_counter()
        sol = solve_batch(None, solver="fr", dtype=np.float32,
                          costs_device=dev, integer=True, max_cost=1000)
        dt = time.perf_counter() - t0
        assert int(sol.num_unassigned.sum()) == 0
        rates.append(batch / dt)
        log(f"batched: {dt:.2f}s -> {batch / dt:.0f} inst/s "
            f"(native tail: {batch_mod.LAST_TAIL_COUNT} stragglers)")
    best = max(rates)
    log(f"batched median: {sorted(rates)[len(rates) // 2]:.0f} inst/s "
        f"over {len(rates)} repeats")

    # sustained protocol: pipelined streaming (solve_batch_stream) —
    # batch i+1's fused program is dispatched before batch i's packed
    # readback blocks, so the ~115 ms tunnel readback overlaps device
    # compute (the north star reads "sustained"; criterion's continuous
    # iteration loop, benchmark.rs:81-157, is the same protocol)
    from sparse_linear_assignment_tpu.batch import solve_batch_stream

    # one untimed pass: first-stream overheads (allocator growth for
    # the window's in-flight staged buffers) otherwise depress repeat 1
    solve_batch_stream(staged[:2], integer=True, max_cost=1000, window=2)
    sustained = []
    for _ in range(3):
        t0 = time.perf_counter()
        sols = solve_batch_stream(staged, integer=True, max_cost=1000,
                                  window=2)
        dt = time.perf_counter() - t0
        assert all(int(s.num_unassigned.sum()) == 0 for s in sols)
        sustained.append(len(staged) * batch / dt)
        log(f"batched stream x{len(staged)}: {dt:.2f}s -> "
            f"{sustained[-1]:.0f} inst/s sustained")
    best = max(best, max(sustained))
    sol = sols[-1]
    # integer costs + eps < 1/n: spot-check exactness vs scipy
    from scipy.optimize import linear_sum_assignment

    for b in (0, 1, batch - 1):
        host = np.asarray(staged[-1][b], dtype=np.float64)
        r, c = linear_sum_assignment(host)
        want = float(host[r, c].sum())
        assert abs(sol.objective[b] - want) < 1e-6, (b, sol.objective[b], want)
    log("batched objectives exact vs scipy oracle (3 spot checks)")
    return best


def bench_batched_sparse(batch=4096, n=128, m=512, k=8, nbatch=5):
    """Batched SPARSE throughput — the reference's own k-regular
    domain (`ksparse.rs:9-19`), batched, device-resident end-to-end:
    device-generated instances (criterion setup split), device scatter
    staging, fused Mosaic Khosla kernel with per-instance early exit,
    on-device objective on the single packed readback, pipelined
    stream for the sustained number (VERDICT r4 item 1)."""
    import jax
    import jax.numpy as jnp
    from sparse_linear_assignment_tpu.batch import (
        solve_batch_sparse_stream,
        stage_batch_sparse_device,
    )

    @jax.jit
    def gen(key):
        kc, kv = jax.random.split(key)
        scores = jax.random.uniform(kc, (batch, n, m), jnp.float32)
        _, cols = jax.lax.top_k(scores, k)
        vals = jax.random.randint(
            kv, (batch, n, k), 300, 1000, dtype=jnp.int32
        ).astype(jnp.float32)
        return cols.astype(jnp.int32), vals

    t0 = time.perf_counter()
    keys = jax.random.split(jax.random.PRNGKey(5), nbatch)
    raw = [gen(kk) for kk in keys]
    staged = [
        stage_batch_sparse_device(c, v, m, eps=1.0 / m) for c, v in raw
    ]
    jax.block_until_ready([s.values_t for s in staged])
    log(f"batched-sparse setup: {nbatch}x{batch}x({n}x{m} k={k}) "
        f"device-generated+staged in {time.perf_counter() - t0:.1f}s "
        f"(setup, excluded)")

    sols = solve_batch_sparse_stream(staged[:2])  # warm/compile pass
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        sols = solve_batch_sparse_stream(staged)
        dt = time.perf_counter() - t0
        rate = nbatch * batch / dt
        best = max(best, rate)
        log(f"batched-sparse stream x{nbatch}: {dt:.2f}s -> "
            f"{rate:.0f} inst/s sustained")
    assert all(int(s.num_unassigned.sum()) == 0 for s in sols)

    # scipy oracle spot checks on the last batch (integer values,
    # eps < 1/n: exact)
    from scipy.optimize import linear_sum_assignment

    cols_h = np.asarray(raw[-1][0][:: batch // 2])
    vals_h = np.asarray(raw[-1][1][:: batch // 2])
    for idx, bi in enumerate(range(0, batch, batch // 2)):
        full = np.full((n, m), 1e9)
        for i in range(n):
            full[i, cols_h[idx, i]] = vals_h[idx, i]
        r, c = linear_sum_assignment(full)
        want = full[r, c].sum()
        assert sols[-1].objective[bi] == want, (
            bi, sols[-1].objective[bi], want
        )
    log(f"batched-sparse: {best:.0f} inst/s sustained, objectives "
        f"exact vs scipy oracle (2 spot checks)")
    return best


def bench_dense_single(n=2048, repeats=3):
    """Single dense instance through the streaming FR kernel
    (ops/pallas_fr_big.py) vs the native engine — the regime where the
    TPU wins outright (BASELINE.md dense rows)."""
    import jax
    import jax.numpy as jnp
    from sparse_linear_assignment_tpu.batch import (
        _cpu_tail_forward,
        solve_batch,
    )

    rng = np.random.default_rng(7)
    costs = rng.integers(1, 1000, size=(1, n, n)).astype(np.float64)
    dev = jnp.asarray(costs.astype(np.float32))
    jax.block_until_ready(dev)
    # eps strictly inside the n*eps < 1 exactness bound for integer
    # costs (eps = 1/n sits exactly on the boundary, where a gap of 1
    # is theoretically admissible and the equality assert could trip)
    eps = 1.0 / (n + 1)
    best = None
    for _ in range(repeats + 1):
        t0 = time.perf_counter()
        sol = solve_batch(costs, solver="fr", dtype=np.float32,
                          eps=eps, costs_device=dev)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    assert int(sol.num_unassigned.sum()) == 0
    t0 = time.perf_counter()
    p2o_cpu, _, _ = _cpu_tail_forward(-costs[0], eps, 10_000_000)
    t_cpu = time.perf_counter() - t0
    obj_cpu = float(costs[0][np.arange(n), p2o_cpu].sum())
    assert abs(float(sol.objective[0]) - obj_cpu) < 1e-6
    log(f"dense {n}x{n} single: TPU {best:.3f}s vs native {t_cpu:.3f}s "
        f"({t_cpu / best:.1f}x, streaming FR kernel, identical objective)")


def main():
    if not require_live_backend():
        speedup = bench_headline_degraded()
        print(json.dumps({
            "metric": "n1e5_k5_sparse_lap_speedup_vs_sequential_cpu",
            "value": round(speedup, 3),
            "unit": "x",
            "vs_baseline": round(speedup, 3),
            "degraded": "tpu_tunnel_unreachable_cpu_only_fallback",
        }))
        return
    start_entries = _cache_entries()
    if start_entries:
        log(f"persistent cache: {len(start_entries)} committed entries "
            f"at start ({_cache_dir()})")
    else:
        log(f"persistent cache EMPTY at start ({_cache_dir()}) — full "
            f"cold compile ahead; the committed .jax_cache did not make "
            f"it into this checkout")
    import jax

    try:  # log WHY any program misses (key diffs) to stderr
        jax.config.update("jax_explain_cache_misses", True)
    except AttributeError:
        pass
    snap = start_entries
    speedup = bench_headline()
    snap = _cache_report("headline", snap)
    try:
        try:
            ips = bench_batched()
        except Exception as e:
            # The fused top-2 halving trees (ops/pallas_fr.py) are the
            # newest Mosaic-lowering surface; if they fail to compile on
            # the driver's toolchain, fall back to the validated serial
            # trees rather than losing the batched record.
            import os

            log(f"batched bench failed ({e!r}) — retrying with "
                f"SLAP_TPU_NO_FUSED_TOP2=1")
            os.environ["SLAP_TPU_NO_FUSED_TOP2"] = "1"
            ips = bench_batched()
        log(f"batched 256x256 throughput: {ips:.0f} inst/s "
            f"(north star 10k/s)")
    except Exception as e:  # batched is secondary; don't fail the bench
        log(f"batched bench failed: {e!r}")
    snap = _cache_report("batched", snap)
    try:
        bench_batched_sparse()
    except Exception as e:  # secondary; don't fail the bench
        log(f"batched-sparse bench failed: {e!r}")
    snap = _cache_report("batched-sparse", snap)
    try:
        bench_dense_single()
    except Exception as e:  # secondary; don't fail the bench
        log(f"dense single bench failed: {e!r}")
    snap = _cache_report("dense", snap)
    total_miss = len(snap - start_entries)
    log(f"CACHE SUMMARY: {len(start_entries)} entries at start, "
        f"{total_miss} misses this run, {len(snap)} at end")
    # Guard the committed cache against CPU-AOT pollution at the source:
    # any entry THIS run wrote must be a TPU program (an XLA:CPU entry
    # embeds the host ELF binary — host-feature-keyed, SIGILL risk on
    # the driver host; tools/check_cache.py audits the whole dir).
    try:
        import os as _os

        from tools.check_cache import classify_entries

        new_cpu = [
            f for f in classify_entries(_cache_dir())[0]
            if _os.path.basename(f) in (snap - start_entries)
        ]
        if new_cpu:
            log(f"CACHE WARNING: this run wrote {len(new_cpu)} XLA:CPU "
                f"AOT entr{'y' if len(new_cpu) == 1 else 'ies'} into "
                f"{_cache_dir()} — run tools/check_cache.py --clean "
                f"before committing")
    except Exception as e:  # the guard must never fail the bench
        log(f"cache ELF guard skipped: {e!r}")
    print(json.dumps({
        "metric": "n1e5_k5_sparse_lap_speedup_vs_sequential_cpu",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup, 3),
    }))


if __name__ == "__main__":
    main()
