"""Benchmark: CLOTH3D frames/sec/chip for the flagship pipelines.

Measures three configurations at the reference's production shapes (T=10
frames, N=6890 points/frame, 6890-vertex body, ~2k-vertex garment, K=256
skinning neighbours; reference `cfgs/skirt.yaml` + `scripts/test/test_skirt.sh`):

  * posed-stage inference (stage-1 canonical encoder + LBS + 3-iteration GCN
    refinement) - the headline metric,
  * canonical-stage inference,
  * posed-stage training step (forward + all losses + backward + Adam).

Output contract: stdout carries ONLY JSON lines, each a complete headline
record; the LAST one is the most complete. Progress/diagnostics go to stderr.

Failure model (the round-2 driver bench died to a transient relay
FAILED_PRECONDITION mid-run, BENCH_r02.json): `python bench.py` runs a
jax-free SUPERVISOR that spawns the measurement WORKER (`bench.py --worker`)
in a subprocess, streams its JSON lines through immediately, and on a worker
crash restarts it (fresh backend) up to 3 attempts - headline-only after the
first. Inside the worker every device fetch is retried via
`garment4d_tpu.utils.relay`, the headline JSON is printed the moment the
posed measurement exists, and each secondary metric is fail-soft (its crash
costs only that metric). The supervisor exits 0 iff a headline was captured.

Baseline derivation (BASELINE_FPS): the reference publishes no throughput
numbers (SURVEY.md section 6), so the PyTorch+CUDA baseline is estimated
bottom-up for its hot path at the same shapes on the V100-class hardware of
its era (14 TFLOP/s f32, 900 GB/s HBM): per 80-frame batch, 9 brute-force
ball queries/iteration x 3 GCN iterations over (2000 centers x 6890 points)
plus the backbone's own queries (~2.5 GB of distance-scan traffic, ~25 ms),
chamferdist K=256 knn over 6890^2 pairs + per-frame (B*T) gathers (~15 ms),
the 100-step sparse weight-smoothing loop at T frames (~10 ms), GCN/MLP/
attention matmuls (~2.2 TFLOP, ~20 ms at ~50% MXU-era efficiency), and
CPU-side seg-selection + scipy Laplacian round-trips (~10 ms): ~80 ms/batch
=> ~1000 frames/s is the OPTIMISTIC compute floor; the reference's measured
GPU utilisation patterns (python-loop seg selection `mesh_encoder.py:109-125`,
per-iteration CUDA launches, GPU->CPU laplacian round trips
`laplacian.py:215-249`) put realistic throughput at ~10% of that floor.
BASELINE_FPS = 100 frames/s/GPU encodes that estimate; vs_baseline divides
by it.
"""

import json
import os
import sys
import time

BASELINE_FPS = 100.0  # estimated reference frames/sec/GPU (see derivation above)
PEAK_F32_FLOPS = 49.2e12  # TPU v5e per-chip peak (f32 on the MXU)

# Wall-clock budget for the whole bench (supervisor start -> last JSON).
# Secondary metrics are skipped when the remaining budget can't cover them;
# the headline is never skipped.
BUDGET_S = float(os.environ.get("G4D_BENCH_BUDGET_S", 2700))
_DEADLINE_ENV = "G4D_BENCH_DEADLINE"

_T0 = time.time()


def _progress(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _emit(record: dict) -> None:
    """Print one complete headline JSON line to stdout (the only stdout
    traffic). Re-emitted with richer `extra` as secondary metrics land."""
    print(json.dumps(record), flush=True)


def _remaining() -> float:
    return float(os.environ.get(_DEADLINE_ENV, _T0 + BUDGET_S)) - time.time()


# ---------------------------------------------------------------------------
# worker
# ---------------------------------------------------------------------------


def _time_fn(run, sync, iters=10, repeats=1):
    """Steady-state seconds per call: dispatch `iters` async jit calls
    back-to-back and force completion once at the end. Syncing every
    iteration would serialize a host<->device round trip (~30-40 ms through
    the axon relay) into each measurement; the device-side program time is
    what throughput is made of (verified against the profiler's XLA Modules
    envelope). The full dispatch+sync block retries once on a transient
    relay failure (re-dispatching re-creates any poisoned buffers).

    `repeats > 1` measures that many independent `iters`-call blocks after
    one shared warm-up and returns the MEDIAN seconds/call plus the sorted
    per-block list, so a single relay hiccup or background-load blip cannot
    move the recorded number (round-4 lesson: two single-sample runs of the
    same HEAD landed 8% apart and were unexplainable after the fact)."""
    from garment4d_tpu.utils.relay import call_with_retry

    def measure():
        sync(run())  # warm-up / compile
        sync(run())
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = run()
            sync(out)
            runs.append((time.perf_counter() - t0) / iters)
        runs.sort()
        return runs[len(runs) // 2], runs

    med, runs = call_with_retry(measure, attempts=2, delay_s=10.0,
                                label="timed measurement")
    return med if repeats == 1 else (med, runs)


class _phase_heartbeat:
    """Emit progress lines every `every_s` while a long SINGLE-CALL phase
    (a train-step recompile, the headline compile) runs, for at most `cap_s`.

    Why: the supervisor's stall watchdog kills the worker after `stall_s`
    (900 s) without output - correct for a wedged chip, but a LEGITIMATE
    recompile after a call-site change can exceed it silently (observed: the
    posed train-step recompile ran past 900 s and was killed as a hang,
    costing that metric). The heartbeat is deliberately BOUNDED: past
    `cap_s` it goes silent again, so the stall watchdog regains authority
    and a truly wedged phase is still killed at cap_s + stall_s worst case
    (the global deadline bounds everything regardless).
    """

    def __init__(self, label: str, cap_s: float, every_s: float = 120.0):
        self.label, self.cap_s, self.every_s = label, cap_s, every_s

    def __enter__(self):
        import threading

        self._stop = threading.Event()
        t0 = time.time()

        def beat():
            while not self._stop.wait(self.every_s):
                el = time.time() - t0
                if el > self.cap_s:
                    _progress(f"{self.label}: heartbeat cap "
                              f"({self.cap_s:.0f}s) reached - going silent "
                              "so the stall watchdog can judge")
                    return
                _progress(f"{self.label}: still running ({el:.0f}s)")

        threading.Thread(target=beat, daemon=True).start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        return False


def _maybe_inject_fault(point: str) -> None:
    """Test hook: `G4D_BENCH_FAULT={pre_headline,post_headline}` makes the
    FIRST worker attempt die at that point with a relay-shaped error, and
    `G4D_BENCH_FAULT=hang_{pre,post}_headline` makes it HANG there (a wedged
    chip blocks host fetches forever instead of raising - the BENCH_r03
    failure shape), so the supervisor's crash AND stall recovery paths can be
    exercised end-to-end (tests/test_bench.py)."""
    fault = os.environ.get("G4D_BENCH_FAULT")
    if os.environ.get("G4D_BENCH_ATTEMPT") != "1" or not fault:
        return
    if fault == point:
        _progress(f"injecting fault at {point}")
        raise RuntimeError("FAILED_PRECONDITION: injected relay fault")
    if fault == f"hang_{point}":
        _progress(f"injecting hang at {point}")
        while True:  # simulated wedged-chip fetch: silent, unbounded
            time.sleep(3600)


def _arm_worker_watchdog() -> None:
    """Belt to the supervisor's braces: a daemon thread that hard-exits the
    worker once the global deadline passes, even while the main thread is
    stuck inside a device fetch that will never return."""
    import threading

    deadline = float(os.environ.get(_DEADLINE_ENV, _T0 + BUDGET_S))

    def watch():
        while True:
            left = deadline - time.time()
            if left <= 0:
                _progress("worker watchdog: global deadline passed "
                          "mid-call; hard-exiting")
                os._exit(3)
            time.sleep(min(30.0, left))

    threading.Thread(target=watch, daemon=True).start()


def worker(headline_only: bool) -> int:
    _arm_worker_watchdog()
    import jax

    if os.environ.get("G4D_BENCH_PLATFORM"):
        # test hook: the axon sitecustomize force-registers the TPU backend,
        # so CPU selection must go through jax.config, not JAX_PLATFORMS
        jax.config.update("jax_platforms", os.environ["G4D_BENCH_PLATFORM"])

    # persistent compile cache: repeated bench runs (and anything else on
    # this box) skip the multi-minute XLA/Mosaic compiles. CPU runs (test
    # hook) use the ISA-keyed dir - XLA:CPU AOT artifacts embed the compile
    # host's ISA and a dir inherited from another box risks SIGILL.
    cache = "/tmp/jax_cache_garment4d"
    if os.environ.get("G4D_BENCH_PLATFORM") == "cpu":
        from __graft_entry__ import _host_cache_dir
        cache = _host_cache_dir()
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from garment4d_tpu import smpl
    from garment4d_tpu.data.synthetic import make_batch
    from garment4d_tpu.models import (
        CanonicalGarmentModel,
        GarmentAssets,
        PosedGarmentModel,
    )
    from garment4d_tpu.train.step import (
        body_inputs_from_batch,
        make_posed_steps,
        make_state_for,
    )
    from garment4d_tpu.utils.relay import call_with_retry

    def sync(x):
        leaf = x
        if isinstance(x, (tuple, list)):
            leaf = x[0]
        return float(np.asarray(leaf.ravel()[0]))

    _progress(f"worker start (backend={jax.default_backend()}, "
              f"headline_only={headline_only}, "
              f"budget remaining {_remaining():.0f}s)")

    if os.environ.get("G4D_BENCH_SHAPES") == "tiny":
        # test hook: shapes small enough for a CPU-backed supervisor test
        B, T, N, lbs_k = 2, 2, 512, 4
        assets = GarmentAssets.synthetic(num_rings=6, ring_size=8)  # Vg=48
        body_model = smpl.synthetic_smpl(num_verts=200)
    else:
        B, T, N, lbs_k = 8, 10, 6890, 256
        assets = GarmentAssets.synthetic(num_rings=125, ring_size=16)  # Vg=2000
        body_model = smpl.synthetic_smpl(num_verts=6890)
    model = PosedGarmentModel(
        assets=assets, body_faces=body_model.faces, lbs_k=lbs_k, iterations=3)

    _progress("building synthetic batch (3 SMPL forwards on device)")
    batch = make_batch(assets, body_model, batch_size=B, T=T, npoints=N)
    body = body_inputs_from_batch(batch)
    _progress("init posed model params (jitted)")
    variables = call_with_retry(
        lambda: jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), batch["pcd"], body, train=False),
        label="model.init")

    # trained-weights mode: random-init weights produce unrealistic
    # data-dependent work (near-zero garment-PE hit density, arbitrary
    # seg selection), so the honest throughput number uses the checked-in
    # synthetic-convergence checkpoint (tools/train_synth.py) when present.
    # G4D_BENCH_WEIGHTS=random forces random-init; =<path> loads that npz.
    weights_env = os.environ.get("G4D_BENCH_WEIGHTS")
    weights = weights_env or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "ckpt_synth", "posed_synth.npz")
    if weights_env and weights_env != "random" and not os.path.exists(weights):
        # an EXPLICIT path must not silently fall back to random-init (it
        # would change what the headline record measures); only the default
        # ckpt_synth location is allowed to be absent
        raise FileNotFoundError(
            f"G4D_BENCH_WEIGHTS={weights_env!r} does not exist")
    if (weights != "random" and os.path.exists(weights)
            and os.environ.get("G4D_BENCH_SHAPES") != "tiny"):
        from garment4d_tpu.train.checkpoint import load_variables_npz

        variables = load_variables_npz(weights, variables)
        extra_weights = os.path.basename(weights)
    else:
        extra_weights = "random-init"
    _progress(f"weights: {extra_weights}")

    @jax.jit
    def posed_fwd(pcd, body):
        return model.apply(variables, pcd, body, train=False).iter_garment_v[-1]

    extra = {"weights": extra_weights}

    # ---- headline: posed-stage inference -------------------------------
    _maybe_inject_fault("pre_headline")
    _progress("compiling + timing posed forward (headline)")
    with _phase_heartbeat("posed fwd compile+time", cap_s=1500):
        dt, dt_runs = _time_fn(lambda: posed_fwd(batch["pcd"], body), sync,
                               repeats=5)
    posed_fps = B * T / dt
    extra["headline_runs_fps"] = [round(B * T / r, 1) for r in dt_runs]
    extra["headline_spread_fps"] = round(
        B * T / dt_runs[0] - B * T / dt_runs[-1], 1)
    record = {
        "metric": "posed_stage_frames_per_sec_per_chip",
        "value": round(posed_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(posed_fps / BASELINE_FPS, 3),
        "extra": extra,
    }
    _emit(record)  # the un-losable line: everything below is fail-soft
    _progress(f"headline: {posed_fps:.1f} frames/s")
    _maybe_inject_fault("post_headline")

    def section(name, min_budget_s, fn):
        """Run a secondary metric fail-soft: a crash or an exhausted budget
        costs only this metric; the headline line above already printed."""
        if headline_only:
            return
        if _remaining() < min_budget_s:
            _progress(f"skipping {name}: {_remaining():.0f}s left "
                      f"< {min_budget_s}s needed")
            return
        _progress(f"measuring {name}")
        try:
            fn()
        except Exception as err:  # noqa: BLE001 - fail-soft by contract
            _progress(f"{name} FAILED (headline unaffected): "
                      f"{type(err).__name__}: {str(err)[:300]}")
            return
        record["extra"] = extra
        _emit(record)

    # ---- MFU: XLA cost model + analytic Pallas-kernel flops ---------------
    # cost_analysis() reports 0 for custom calls, so the XLA number alone
    # understates utilization by the Pallas share of the step (most of it).
    # utils/flops.py mirrors the kernels' executed arithmetic; the combined
    # number is the honest one, and the MXU/VPU split says which unit the
    # step is bound on (VPU ops run ~1-2% of MXU f32 peak per op).
    def mfu():
        from garment4d_tpu.utils import flops as F

        if os.environ.get("G4D_BENCH_SHAPES") == "tiny":
            # the analytic inventory hardcodes the PRODUCTION call sites
            # (FPS 6890->1024, 3 refinement iterations); at tiny test shapes
            # it would count work that never runs, so skip the whole section
            _progress("skipping MFU: analytic kernel inventory is only "
                      "valid at production shapes")
            return
        cost = posed_fwd.lower(batch["pcd"], body).compile().cost_analysis()
        xla_flops = float(cost.get("flops", 0.0))
        pk = F.posed_forward_cost(B, T, N=N, Vg=assets.num_verts)
        total = xla_flops + pk.total
        extra["posed_fwd_flops_xla"] = xla_flops
        extra["posed_fwd_flops_pallas_mxu"] = pk.mxu
        extra["posed_fwd_lane_ops_pallas_vpu"] = pk.vpu
        extra["posed_fwd_mfu_f32"] = round(total / dt / PEAK_F32_FLOPS, 4)
        extra["posed_fwd_mxu_fraction"] = round(
            (xla_flops + pk.mxu) / max(total, 1.0), 4)

    section("cost-model MFU", 30, mfu)

    # (the opt-in --bf16 encoder mode was measured at these shapes: 154 vs
    # 156 f/s - the workload is selection/VPU-bound, not matmul-bound, so
    # the casts outweigh the MXU savings; not benched to keep compiles lean)

    # ---- canonical-stage inference --------------------------------------
    def canonical():
        canon = CanonicalGarmentModel(assets=assets)
        canon_vars = call_with_retry(
            lambda: jax.jit(canon.init, static_argnames=("train",))(
                jax.random.PRNGKey(0), batch["pcd"], train=False),
            label="canonical init")

        @jax.jit
        def canon_fwd(pcd):
            return canon.apply(canon_vars, pcd, train=False).tpose_garment

        with _phase_heartbeat("canonical compile+time", cap_s=1200):
            dt_c = _time_fn(lambda: canon_fwd(batch["pcd"]), sync)
        extra["canonical_fwd_frames_per_sec"] = round(B * T / dt_c, 2)

    section("canonical forward", 180, canonical)

    # ---- posed-stage training step (B=4 per the reference recipe,
    # scripts/train/train_skirt_posed.sh) ---------------------------------
    def train():
        Bt = 4
        tb = make_batch(assets, body_model, batch_size=Bt, T=T, npoints=N,
                        seed=1)
        state = make_state_for(model, variables, assets, lr=1e-3,
                               freeze_canonical=True)
        train_step, _ = make_posed_steps(model, assets, body_model.faces)
        rng = jax.random.PRNGKey(1)
        holder = {"state": state}

        def run_train():
            holder["state"], losses = train_step(holder["state"], tb, rng)
            return losses["total_loss"]

        # the train step is the longest compile unit in the repo (fwd + all
        # losses + bwd + Adam): a cold cache after any call-site change runs
        # well past the 900 s stall window
        with _phase_heartbeat("train-step compile+time", cap_s=1500):
            dt_t = _time_fn(run_train, sync, iters=5)
        extra["posed_train_frames_per_sec"] = round(Bt * T / dt_t, 2)
        extra["posed_train_step_s"] = round(dt_t, 4)

    section("posed train step", 240, train)

    _progress("worker done")
    return 0


# ---------------------------------------------------------------------------
# supervisor
# ---------------------------------------------------------------------------


def _pump(proc, on_stdout, on_stderr, deadline: float, stall_s: float):
    """Stream a worker's stdout+stderr through reader THREADS with a
    watchdog, so a hung worker (wedged chip: host fetches block forever
    rather than raising - BENCH_r03.json rc=124 was exactly this) can never
    hang the supervisor. Returns (rc, failure_reason|None). The main loop
    only ever blocks on a 5 s queue poll; it kills the worker when the
    global deadline passes or when NO line (either stream) has arrived for
    `stall_s` - longer than any legitimate compile unit between the
    worker's progress lines."""
    import queue
    import subprocess
    import threading

    q: "queue.Queue" = queue.Queue()

    def reader(stream, tag):
        for line in iter(stream.readline, ""):
            q.put((tag, line.rstrip("\n")))
        q.put((tag, None))

    threads = [
        threading.Thread(target=reader, args=(proc.stdout, "out"), daemon=True),
        threading.Thread(target=reader, args=(proc.stderr, "err"), daemon=True),
    ]
    for t in threads:
        t.start()

    eof = {"out": False, "err": False}
    last_line = time.time()
    failure = None
    while not (eof["out"] and eof["err"]):
        now = time.time()
        if now > deadline:
            failure = f"global deadline ({BUDGET_S:.0f}s budget) passed"
            break
        if now - last_line > stall_s:
            failure = (f"no worker output for {stall_s:.0f}s "
                       "(hung device fetch / wedged chip?)")
            break
        try:
            tag, line = q.get(timeout=5.0)
        except queue.Empty:
            continue
        last_line = time.time()
        if line is None:
            eof[tag] = True
            continue
        (on_stdout if tag == "out" else on_stderr)(line)
    if failure is not None:
        # NOTE: killing an axon client leaves the chip claim held server-side
        # for ~10-15 min; the NEXT attempt will block in backend init until
        # it frees. That wait shows no output, so stall_s must exceed it -
        # do not lower G4D_BENCH_STALL_S below ~900 on the relay.
        proc.kill()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            pass
        return -9, failure
    try:
        rc = proc.wait(timeout=60)
    except subprocess.TimeoutExpired:
        proc.kill()
        rc = -9
    return rc, None


def supervise() -> int:
    """Run the worker in a subprocess; restart it on crashes AND hangs until
    a headline JSON line exists. Worker stdout (JSON lines only) streams
    through unbuffered so an external kill still leaves the newest record on
    our stdout; worker stderr streams to our stderr. Contract: the LAST
    stdout line is always a complete JSON record - the headline, or an
    {"error": ...} diagnostic when every attempt failed - so a truncated/
    timed-out run can never again leave a blank record (BENCH_r03)."""
    import subprocess

    deadline = _T0 + BUDGET_S
    stall_s = float(os.environ.get("G4D_BENCH_STALL_S", 900))
    env = dict(os.environ)
    env[_DEADLINE_ENV] = repr(deadline)
    env.setdefault("PYTHONUNBUFFERED", "1")

    got_headline = False
    attempts_log = []
    for attempt in range(1, 4):
        if time.time() > deadline - 60:
            _progress(f"budget exhausted before attempt {attempt}")
            attempts_log.append({"attempt": attempt,
                                 "failure": "budget exhausted before start"})
            break
        cmd = [sys.executable, os.path.abspath(__file__), "--worker"]
        if attempt > 1:
            cmd.append("--headline-only")
        env["G4D_BENCH_ATTEMPT"] = str(attempt)
        _progress(f"supervisor: starting worker attempt {attempt}: "
                  f"{' '.join(cmd[1:])}")

        def on_stdout(line):
            nonlocal got_headline
            if not line:
                return
            try:
                rec = json.loads(line)
                if "metric" in rec and "value" in rec:
                    got_headline = True
            except ValueError:
                _progress(f"supervisor: non-JSON worker stdout: {line[:200]}")
                return
            print(line, flush=True)  # pass through immediately

        def on_stderr(line):
            print(line, file=sys.stderr, flush=True)

        try:
            proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                                    stderr=subprocess.PIPE, text=True,
                                    bufsize=1)
            rc, failure = _pump(proc, on_stdout, on_stderr, deadline, stall_s)
        except Exception as err:  # noqa: BLE001 - spawn/stream failures
            rc, failure = -1, f"{type(err).__name__}: {err}"
        attempts_log.append({"attempt": attempt, "rc": rc,
                             "failure": failure})
        if got_headline:
            if rc != 0:
                _progress("supervisor: worker died AFTER the headline - "
                          "record is safe, not retrying")
            return 0
        _progress(f"supervisor: worker attempt {attempt} exited rc={rc}"
                  + (f" ({failure})" if failure else "") + " with no headline"
                  + ("; retrying" if attempt < 3 else ""))
    if not got_headline:
        # final-line contract: a structured diagnostic, never a blank record
        _emit({"error": "no headline captured", "attempts": attempts_log,
               "elapsed_s": round(time.time() - _T0, 1)})
    return 0 if got_headline else 1


if __name__ == "__main__":
    if "--worker" in sys.argv:
        sys.exit(worker(headline_only="--headline-only" in sys.argv))
    sys.exit(supervise())
