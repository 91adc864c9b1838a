"""Multi-host serving: a coordinator/worker wrapper around the mesh Scorer.

JAX's multi-controller model requires EVERY process to enter every
collective in lockstep — a TCP request arriving at one host cannot simply
call a pod-wide jitted program.  `MultiHostScorer` solves this the standard
SPMD-serving way:

  * process 0 (the coordinator) exposes the normal Scorer API; each scoring
    call first broadcasts a small header to all processes, ships each
    process ITS slice of the payload (see below), then every process enters
    the same sharded program together;
  * processes 1..N-1 run `worker_loop()`, which blocks on the next header
    and mirrors the coordinator's device calls;
  * an optional heartbeat thread broadcasts no-ops while idle so the
    workers' pending collective never hits the runtime's timeout;
  * `close()` broadcasts a stop op; `worker_loop` returns.

Payload distribution (pod-scale DCN economics): by default the coordinator
SCATTERS — each worker process receives only its own data-axis rows of the
frame/mask batch through the distributed KV store (the same coordination
service jax.distributed already runs), so per-call cross-host traffic is
~batch_bytes, not hosts x batch_bytes.  `scatter=False` falls back to the
simple full-batch `broadcast_one_to_all` (every process gets everything),
kept for debugging and for runtimes without a KV client.  Model-sharded
arrays (the output layer) never move at call time in either mode — only
the per-call frames/masks do.

Failure model: a dead worker stalls the pod's next collective forever (the
runtime cannot cancel a hung all-reduce).  `call_timeout_s` arms a watchdog
around every coordinated call: on expiry the scorer marks itself closed and
raises RuntimeError — callers get a clean, loud failure instead of a silent
hang, and supervisors must restart all processes (the collectives cannot be
resynchronized).  First-of-its-kind calls (per program and bucketed
shape) get the larger `first_call_timeout_s` allowance (they include a
jit compile), and on
expiry a best-effort OP_STOP is queued behind the abandoned call's
collectives so a merely-slow pod's workers exit their loops instead of
hanging at the next header broadcast.  Workers log loudly and re-raise on
their side (worker_loop).

With a single process (jax.process_count() == 1) the wrapper is inert and
MultiHostScorer behaves exactly like Scorer(mesh=...) — so CLIs can always
construct it and only spawn the worker loop when genuinely multi-process.

The reference has no analog (it is a single-process library, SURVEY.md §2
"Parallelism ... none exist"); this replaces its thread-per-caller JNI
serving model (MultiThreadedStressTest.java) at pod scale.

Protocol note: LazyContext over multiple processes is a coordinator-side
shim (`_MultiHostLazyContext`) that routes each per-frame masked call
through the coordinated score_masked program — no retained pod-sharded
device state, no extra protocol ops; workers just keep running
worker_loop().  For throughput use score_masked batch-wise.
"""

from __future__ import annotations

import threading
from typing import Optional

import jax
import numpy as np

from ..config import EngineConfig
from ..engine.scorer import Scorer
from ..quant.quantize import QuantizedNet

OP_STOP, OP_NOOP, OP_SCORE, OP_MASKED = 0, 1, 2, 3

#: KV-store key prefix for scattered payload slices (coordination-service
#: namespace; keys are deleted by their reader)
_KV_PREFIX = "fastdnn/scatter"


def _broadcast(x: np.ndarray) -> np.ndarray:
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(x))


def _kv_client():
    """The jax.distributed coordination-service KV client, or None.

    Current jax keeps global_state in jax._src.distributed (the public
    jax.distributed module stopped re-exporting it); older releases had
    jax.distributed.global_state.  Probe both — a silent None here quietly
    demotes every scatter pod to full-batch broadcast (hosts x batch DCN
    traffic), which is how the r4 advisor's test request caught this very
    function returning None on the current toolchain.
    """
    for get in (
        lambda: jax.distributed.global_state.client,
        lambda: __import__(
            "jax._src.distributed", fromlist=["global_state"]
        ).global_state.client,
    ):
        try:
            client = get()
        except Exception:
            continue
        if client is not None:
            return client
    return None


def _is_kv_timeout(e: BaseException) -> bool:
    """True when a blocking KV get failed by TIMING OUT (safe to retry).

    The coordination service surfaces expiry as an XlaRuntimeError whose
    message carries the gRPC status name — "DEADLINE_EXCEEDED" in current
    jaxlib (pinned by tests/test_multihost.py against the real exception) —
    but the wording is not a stable API, so match the broader timeout
    vocabulary: a benign periodic expiry that re-raises because jaxlib
    reworded it would kill the worker, which is pod-fatal under the
    wait-forever contract.  Anything non-timeout (UNAVAILABLE after a
    coordinator crash, service torn down, bad key) stays False so
    worker_loop's log-and-re-raise contract fires.
    """
    msg = str(e).upper()
    return "DEADLINE" in msg or "TIMEOUT" in msg or "TIMED OUT" in msg


def _to_global(mesh, spec, arr: np.ndarray):
    """Host array (identical in every process after broadcast) -> global
    jax.Array with the given sharding: each process materializes only its
    addressable shards (make_array_from_callback slices locally)."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def _row_ranges(sharding, shape) -> dict:
    """Per-process contiguous data-axis row windows {process: [lo, hi)}
    under `sharding` for a global `shape` array, from ONE
    devices_indices_map pass.

    Mesh device order is process-major (parallel.mesh.make_mesh uses
    jax.devices(), which lists each process's devices consecutively), so a
    process's data rows form one contiguous window; a model axis spanning
    processes degenerates to the full range (every process then genuinely
    needs all rows).  Single source of truth for the scatter protocol —
    the coordinator's ship side and the workers' receive side both derive
    their windows from this function.
    """
    ranges: dict = {}
    for dev, idx in sharding.devices_indices_map(tuple(shape)).items():
        rows = idx[0]
        lo = 0 if rows.start is None else rows.start
        hi = shape[0] if rows.stop is None else rows.stop
        old = ranges.get(dev.process_index)
        ranges[dev.process_index] = (
            (lo, hi) if old is None else (min(old[0], lo), max(old[1], hi))
        )
    return ranges


def _process_row_range(mesh, spec, shape) -> tuple[int, int]:
    """This process's contiguous data-axis row range [start, stop) under
    NamedSharding(mesh, spec) for a global `shape` array."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return _row_ranges(sharding, shape).get(jax.process_index(), (0, 0))


class MultiHostScorer(Scorer):
    """Scorer over a multi-process mesh with coordinator-side distribution.

    Construct identically in every process (same net bytes, same config,
    same mesh); call `worker_loop()` in processes != 0; use the normal
    Scorer API in process 0.

    scatter: ship each process only its data-axis payload slice (default);
        False = full-batch broadcast to every process.
    call_timeout_s: watchdog for coordinated calls — expiry means a worker
        is unreachable; the scorer closes itself and raises.  None = wait
        forever (the r1 behavior).
    first_call_timeout_s: watchdog allowance for every FIRST-OF-ITS-KIND
        coordinated call — one per (program, bucketed shape), since each
        includes a jit compile (20-40 s per shape even single-chip;
        minutes on large pods) — a production call_timeout_s tuned to
        steady-state latency would otherwise declare a healthy pod dead
        while it compiles.  Defaults to max(call_timeout_s, 300); ignored
        when call_timeout_s is None.
    """

    def __init__(
        self,
        net: QuantizedNet,
        config: Optional[EngineConfig] = None,
        mesh=None,
        *,
        heartbeat_s: float = 5.0,
        scatter: bool = True,
        call_timeout_s: Optional[float] = None,
        first_call_timeout_s: Optional[float] = None,
    ):
        if mesh is None:
            raise ValueError("MultiHostScorer requires a mesh")
        super().__init__(net, config, mesh)
        self._multi = jax.process_count() > 1
        self.is_coordinator = jax.process_index() == 0
        self._closed = False
        self._hb_thread: Optional[threading.Thread] = None
        self._call_timeout_s = call_timeout_s
        if first_call_timeout_s is None and call_timeout_s is not None:
            first_call_timeout_s = max(call_timeout_s, 300.0)
        self._first_call_timeout_s = first_call_timeout_s
        # (program, shape) keys whose call completed once: compiled already
        self._warm_keys: set = set()
        if not self._multi:
            return
        self._scatter = scatter and _kv_client() is not None
        self._seq = 0
        # every broadcast pair (header, payload) must be serialized: the
        # heartbeat and concurrent scorers may not interleave collectives
        self._bcast_lock = threading.Lock()
        self._score_prog = self._score
        self._masked_prog = self._score_masked
        from jax.sharding import PartitionSpec as P

        from .mesh import DATA_AXIS, MODEL_AXIS

        self._frames_spec = P(DATA_AXIS, None)
        # make_mesh_programs' mask spec: model-sharded only when split
        self._masks_spec = (
            P(DATA_AXIS, MODEL_AXIS) if mesh.shape[MODEL_AXIS] > 1 else P(DATA_AXIS, None)
        )
        from jax.sharding import NamedSharding

        # posteriors come back sharded across processes; np.asarray cannot
        # read non-addressable shards, so every process enters this
        # replicate collective and the coordinator reads its local copy
        self._replicate = jax.jit(
            lambda x: x, out_shardings=NamedSharding(mesh, P())
        )
        if self.is_coordinator:
            self._score = self._coordinated_score
            self._score_masked = self._coordinated_masked
            if heartbeat_s > 0:
                self._hb_thread = threading.Thread(
                    target=self._heartbeat, args=(heartbeat_s,), daemon=True
                )
                self._hb_thread.start()

    # -- payload distribution --------------------------------------------------

    def _ship_global(self, seq: int, tag: str, spec, arr: np.ndarray):
        """Coordinator: turn a full host batch into the global sharded array,
        shipping each worker only its rows (scatter) or everything
        (broadcast fallback).  Returns the global jax.Array."""
        if not self._scatter:
            _broadcast(arr)
            return _to_global(self.mesh, spec, arr)
        client = _kv_client()
        # per-process contiguous row ranges (frame counts are bucketed to a
        # multiple of the data axis, so ranges tile [0, n) evenly)
        from jax.sharding import NamedSharding

        sharding = NamedSharding(self.mesh, spec)
        ranges = _row_ranges(sharding, arr.shape)
        for p in sorted(ranges):
            if p == 0:
                continue
            lo, hi = ranges[p]
            client.key_value_set_bytes(
                f"{_KV_PREFIX}/{seq}/{tag}/{p}", arr[lo:hi].tobytes()
            )
        lo, hi = ranges.get(0, (0, 0))
        return _assemble(sharding, np.ascontiguousarray(arr[lo:hi]), lo, arr.shape)

    def _recv_global(self, seq: int, tag: str, spec, shape, dtype):
        """Worker: fetch this process's rows and assemble the global array."""
        from jax.sharding import NamedSharding

        if not self._scatter:
            arr = _broadcast(np.zeros(shape, dtype))
            return _to_global(self.mesh, spec, arr)
        client = _kv_client()
        lo, hi = _process_row_range(self.mesh, spec, shape)
        key = f"{_KV_PREFIX}/{seq}/{tag}/{jax.process_index()}"
        if self._call_timeout_s is None:
            # wait-forever contract (matches the no-watchdog coordinator):
            # the KV client has no infinite timeout, so retry the blocking
            # get indefinitely — a coordinator stalled between the header
            # broadcast and key_value_set must not desynchronize the pod
            while True:
                try:
                    raw = client.blocking_key_value_get_bytes(key, 600_000)
                    break
                except Exception as e:
                    # retry only a genuine expiry (see _is_kv_timeout);
                    # anything else must surface loudly so worker_loop's
                    # log-and-re-raise contract fires instead of wedging
                    # the worker in a silent retry loop
                    if not _is_kv_timeout(e):
                        raise
                    continue
        else:
            raw = client.blocking_key_value_get_bytes(
                key, int(self._call_timeout_s * 1000)
            )
        try:
            client.key_value_delete(key)
        except Exception:  # cleanup is best-effort
            pass
        local = np.frombuffer(raw, dtype=dtype).reshape(hi - lo, *shape[1:])
        sharding = NamedSharding(self.mesh, spec)
        return _assemble(sharding, local, lo, tuple(shape))

    # -- coordinator side ----------------------------------------------------

    def _with_watchdog(self, fn, key=None):
        """Run fn(locked); if the call timeout elapses first, declare the
        pod dead.

        `fn` receives a threading.Event and must set it the moment it holds
        `_bcast_lock`: the timeout clock starts only THEN.  Concurrent
        scorer calls are a supported pattern (the lock exists to serialize
        them), so time spent queued behind another healthy in-flight call
        must not count toward the steady-state timeout — only the in-lock
        portion (the actual coordinated collectives) is timed.  While
        queued, the caller polls `_closed` so a pod declared dead by the
        call ahead of it fails fast instead of waiting out its own timer.

        A coordinated call whose (program, shape) `key` has not completed
        before gets first_call_timeout_s — jit compilation is per program
        and per bucketed shape, not per scorer, so EVERY first-of-its-kind
        call includes a compile; repeat calls get call_timeout_s.  The hung
        collective cannot be cancelled — the runner thread is abandoned
        (daemon) and the scorer closes so subsequent calls fail fast
        instead of stacking up behind a dead pod.  On expiry a best-effort
        OP_STOP is fired from another daemon thread: if the pod was merely
        slow (workers alive, call eventually drains), that stop op is the
        next header they pair with and they exit their loops instead of
        hanging forever; if a worker is truly dead the stop broadcast
        hangs too, but only inside an abandoned thread.
        """
        if self._call_timeout_s is None:
            return fn(None)
        warm = key in self._warm_keys
        timeout = self._call_timeout_s if warm else self._first_call_timeout_s
        result: list = [None]
        error: list = [None]
        locked = threading.Event()

        def run():
            try:
                result[0] = fn(locked)
            except BaseException as e:  # surfaced to the caller below
                error[0] = e
            finally:
                locked.set()  # unblock the caller on pre-lock failure too

        t = threading.Thread(target=run, daemon=True)
        t.start()
        while not locked.wait(0.25):  # untimed queueing phase
            if self._closed:
                raise RuntimeError(
                    "MultiHostScorer was closed while this call was queued "
                    "behind another (pod declared dead or workers released)"
                )
        t.join(timeout)
        if t.is_alive():
            self._closed = True

            def _stop_when_drained():
                # _bcast_lock orders this after the abandoned call's
                # collectives; it blocks forever if the pod is truly dead,
                # but only inside this abandoned daemon thread
                lock = getattr(self, "_bcast_lock", None)
                if lock is None:  # single-process: nothing to release
                    return
                with lock:
                    _broadcast(np.array([OP_STOP, 0, 0, 0, 0], np.int32))

            threading.Thread(target=_stop_when_drained, daemon=True).start()
            raise RuntimeError(
                f"multi-host scoring call did not complete within "
                f"{timeout}s — a worker process is likely dead "
                "and the pod's collectives cannot make progress; restart "
                "all processes"
            )
        if error[0] is not None:
            raise error[0]
        self._warm_keys.add(key)
        return result[0]

    def _coordinated_score(self, net, padded, _masks=None):
        frames = np.asarray(padded, np.float32)

        def call(locked=None):
            self._check_open()  # fail fast: the lock may be held by a hung call
            with self._bcast_lock:
                if locked is not None:
                    locked.set()  # watchdog clock starts here
                self._check_open()
                self._seq += 1
                _broadcast(np.array(
                    [OP_SCORE, frames.shape[0], frames.shape[1], 0, self._seq],
                    np.int32,
                ))
                gf = self._ship_global(self._seq, "f", self._frames_spec, frames)
                return self._replicate(self._score_prog(net, gf))

        return self._with_watchdog(call, ("score",) + frames.shape)

    def _check_open(self):
        if self._closed:
            raise RuntimeError(
                "MultiHostScorer is closed (workers released or pod declared "
                "dead)"
            )

    def _coordinated_masked(self, net, padded, masks):
        frames = np.asarray(padded, np.float32)
        masks = np.asarray(masks, np.uint8)

        def call(locked=None):
            self._check_open()
            with self._bcast_lock:
                if locked is not None:
                    locked.set()  # watchdog clock starts here
                self._check_open()
                self._seq += 1
                _broadcast(np.array(
                    [OP_MASKED, frames.shape[0], frames.shape[1],
                     masks.shape[1], self._seq],
                    np.int32,
                ))
                gf = self._ship_global(self._seq, "f", self._frames_spec, frames)
                gm = self._ship_global(self._seq, "m", self._masks_spec, masks)
                return self._replicate(self._masked_prog(net, gf, gm))

        return self._with_watchdog(
            call, ("masked",) + frames.shape + masks.shape
        )

    def _heartbeat(self, interval: float) -> None:
        import time

        def beat(locked=None):
            with self._bcast_lock:
                if locked is not None:
                    locked.set()  # watchdog clock starts here
                if self._closed:
                    return
                _broadcast(np.array([OP_NOOP, 0, 0, 0, 0], np.int32))

        while not self._closed:
            time.sleep(interval)
            if self._closed:
                return
            try:
                # the beat runs under the SAME call watchdog as scorer calls:
                # if a worker dies while the heartbeat holds _bcast_lock, the
                # broadcast would hang the lock forever and every queued call
                # would spin in its untimed queueing phase — the watchdog
                # declares the pod dead (_closed) so they fail fast instead
                self._with_watchdog(beat, ("heartbeat",))
            except Exception:
                if self._closed:
                    return  # pod declared dead (by this beat or a queued call)
                # a transient beat failure (e.g. ABORTED from a racing
                # broadcast) with the scorer still open must not silently
                # disable the heartbeat for good — the workers' pending
                # collective would then hit the runtime timeout while idle
                import logging

                logging.getLogger(__name__).warning(
                    "multi-host heartbeat broadcast failed; retrying",
                    exc_info=True,
                )
                continue

    def close(self) -> None:
        """Coordinator: release the workers (broadcast stop)."""
        if not self._multi or not self.is_coordinator or self._closed:
            self._closed = True
            return
        with self._bcast_lock:
            self._closed = True
            _broadcast(np.array([OP_STOP, 0, 0, 0, 0], np.int32))

    # -- worker side -----------------------------------------------------------

    def worker_loop(self) -> None:
        """Processes != 0: mirror the coordinator's device calls until stop.

        A failure here is FATAL for the pod — the coordinator's next
        collective would hang against a dead worker — so errors are logged
        loudly and re-raised instead of swallowed; supervisors should
        treat a worker exit without a prior stop op as a pod restart.
        """
        if not self._multi:
            return
        assert not self.is_coordinator, "worker_loop is for processes != 0"
        try:
            while True:
                op, n, d, m, seq = _broadcast(np.zeros(5, np.int32))
                if op == OP_STOP:
                    return
                if op == OP_NOOP:
                    continue
                gf = self._recv_global(seq, "f", self._frames_spec, (n, d),
                                       np.float32)
                if op == OP_MASKED:
                    gm = self._recv_global(seq, "m", self._masks_spec, (n, m),
                                           np.uint8)
                    out = self._masked_prog(self.net, gf, gm)
                else:
                    out = self._score_prog(self.net, gf)
                # enter the coordinator's replicate collective and force it
                self._replicate(out).block_until_ready()
        except Exception:
            import logging

            logging.getLogger(__name__).exception(
                "multi-host scoring worker %d died; the pod's collectives "
                "cannot make progress — restart all processes",
                jax.process_index(),
            )
            raise

    # -- lazy API over multiple processes ---------------------------------------

    def new_lazy_context(self, input_vector_count: int):
        """LazyContext parity over a pod (QuantizedDnn.java:72-107).

        Coordinator-only: per-frame masked calls route through the
        coordinated score_masked program, so workers just keep running
        worker_loop() — no new protocol ops."""
        if self._multi:
            if not self.is_coordinator:
                raise RuntimeError(
                    "LazyContext is coordinator-only on a multi-process "
                    "mesh; worker processes run worker_loop()"
                )
            return _MultiHostLazyContext(self, input_vector_count)
        return super().new_lazy_context(input_vector_count)


class _MultiHostLazyContext:
    """Frame-by-frame lazy scoring over a multi-process pod.

    API-parity shim (same surface as engine.scorer.LazyContext /
    QuantizedDnn.java:72-98): each `calculate_for_output_nodes(mask)` routes
    ONE frame through the coordinated score_masked program, recomputing the
    hidden trunk for that frame instead of retaining pod-sharded activations
    — retained device state would require every per-frame device op to be
    mirrored in the worker protocol, and the per-frame latency is dominated
    by the pod round trip either way.  Semantically exact (same masked
    softmax program as the batch path).  For throughput use score_masked
    directly, exactly as the single-process LazyContext docs advise.
    """

    def __init__(self, scorer: "MultiHostScorer", input_vector_count: int):
        self._scorer = scorer
        self.input_vector_count = input_vector_count
        self.current_vector_index = 0
        self._frames: Optional[np.ndarray] = None

    def calculate_until_output(self, frames) -> None:
        frames = np.asarray(frames, dtype=np.float32)
        if frames.shape[0] != self.input_vector_count:
            raise ValueError(
                f"expected {self.input_vector_count} frames, got {frames.shape[0]}"
            )
        self._frames = frames
        self.current_vector_index = 0  # context is reusable across utterances

    def calculate_for_output_nodes(self, mask) -> np.ndarray:
        """Posteriors f32 [out] for the next frame given its active-node mask."""
        if self._frames is None:
            raise RuntimeError("call calculate_until_output first")
        i = self.current_vector_index
        if i >= self.input_vector_count:
            raise IndexError("all frames already consumed")
        mask = (np.asarray(mask).reshape(1, -1) != 0).astype(np.uint8)
        out = self._scorer.score_masked(self._frames[i : i + 1], mask)
        self.current_vector_index += 1
        return out[0]


def _assemble(sharding, local_rows: np.ndarray, lo: int, shape):
    """Global sharded array from this process's row window [lo, lo+len).

    make_array_from_callback asks for each ADDRESSABLE shard by global
    index; shifting the row slice into the local window serves any spec —
    row-sharded masks/frames and column-sharded (model-axis) masks alike
    (columns are always fully present in the shipped rows).
    """

    def cb(idx):
        rows = idx[0]
        r0 = (rows.start or 0) - lo
        r1 = (shape[0] if rows.stop is None else rows.stop) - lo
        return local_rows[(slice(r0, r1),) + tuple(idx[1:])]

    return jax.make_array_from_callback(tuple(shape), sharding, cb)
