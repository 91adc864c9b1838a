"""Multi-host serving: a coordinator/worker wrapper around the mesh Scorer.

JAX's multi-controller model requires EVERY process to enter every
collective in lockstep — a TCP request arriving at one host cannot simply
call a pod-wide jitted program.  `MultiHostScorer` solves this the standard
SPMD-serving way:

  * process 0 (the coordinator) exposes the normal Scorer API; each scoring
    call first broadcasts a small header + the batch to all processes
    (jax.experimental.multihost_utils.broadcast_one_to_all), then every
    process enters the same sharded program together;
  * processes 1..N-1 run `worker_loop()`, which blocks on the next
    broadcast and mirrors the coordinator's device calls;
  * an optional heartbeat thread broadcasts no-ops while idle so the
    workers' pending collective never hits the runtime's timeout;
  * `close()` broadcasts a stop op; `worker_loop` returns.

With a single process (jax.process_count() == 1) the wrapper is inert and
MultiHostScorer behaves exactly like Scorer(mesh=...) — so CLIs can always
construct it and only spawn the worker loop when genuinely multi-process.

The reference has no analog (it is a single-process library, SURVEY.md §2
"Parallelism ... none exist"); this replaces its thread-per-caller JNI
serving model (MultiThreadedStressTest.java) at pod scale.

Protocol note: LazyContext requires per-frame coordinator/worker round
trips over retained device state; it is supported on single-process meshes
but deliberately not over multiple processes (score_masked covers the lazy
semantics batch-wise there).
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


def _broadcast(x: np.ndarray) -> np.ndarray:
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(x))


def _to_global(mesh, spec, arr: np.ndarray):
    """Host array (identical in every process after broadcast) -> global
    jax.Array with the given sharding: each process materializes only its
    addressable shards (make_array_from_callback slices locally)."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


class MultiHostScorer(Scorer):
    """Scorer over a multi-process mesh with coordinator-side broadcast.

    Construct identically in every process (same net bytes, same config,
    same mesh); call `worker_loop()` in processes != 0; use the normal
    Scorer API in process 0.
    """

    def __init__(
        self,
        net: QuantizedNet,
        config: Optional[EngineConfig] = None,
        mesh=None,
        *,
        heartbeat_s: float = 5.0,
    ):
        if mesh is None:
            raise ValueError("MultiHostScorer requires a mesh")
        super().__init__(net, config, mesh)
        self._multi = jax.process_count() > 1
        self.is_coordinator = jax.process_index() == 0
        self._closed = False
        self._hb_thread: Optional[threading.Thread] = None
        if not self._multi:
            return
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

    # -- coordinator side ----------------------------------------------------

    def _coordinated_score(self, net, padded, _masks=None):
        frames = np.asarray(padded, np.float32)
        with self._bcast_lock:
            if self._closed:
                raise RuntimeError("MultiHostScorer is closed (workers released)")
            _broadcast(np.array([OP_SCORE, frames.shape[0], frames.shape[1], 0], np.int32))
            _broadcast(frames)
            gf = _to_global(self.mesh, self._frames_spec, frames)
            return self._replicate(self._score_prog(net, gf))

    def _coordinated_masked(self, net, padded, masks):
        frames = np.asarray(padded, np.float32)
        masks = np.asarray(masks, np.uint8)
        with self._bcast_lock:
            if self._closed:
                raise RuntimeError("MultiHostScorer is closed (workers released)")
            _broadcast(
                np.array(
                    [OP_MASKED, frames.shape[0], frames.shape[1], masks.shape[1]],
                    np.int32,
                )
            )
            _broadcast(frames)
            _broadcast(masks)
            gf = _to_global(self.mesh, self._frames_spec, frames)
            gm = _to_global(self.mesh, self._masks_spec, masks)
            return self._replicate(self._masked_prog(net, gf, gm))

    def _heartbeat(self, interval: float) -> None:
        import time

        while not self._closed:
            time.sleep(interval)
            if self._closed:
                return
            with self._bcast_lock:
                if self._closed:
                    return
                _broadcast(np.array([OP_NOOP, 0, 0, 0], np.int32))

    def close(self) -> None:
        """Coordinator: release the workers (broadcast stop)."""
        if not self._multi or not self.is_coordinator or self._closed:
            self._closed = True
            return
        with self._bcast_lock:
            self._closed = True
            _broadcast(np.array([OP_STOP, 0, 0, 0], np.int32))

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
                op, n, d, m = _broadcast(np.zeros(4, np.int32))
                if op == OP_STOP:
                    return
                if op == OP_NOOP:
                    continue
                frames = _broadcast(np.zeros((n, d), np.float32))
                gf = _to_global(self.mesh, self._frames_spec, frames)
                if op == OP_MASKED:
                    masks = _broadcast(np.zeros((n, m), np.uint8))
                    gm = _to_global(self.mesh, self._masks_spec, masks)
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

    # -- unsupported over multiple processes -----------------------------------

    def new_lazy_context(self, input_vector_count: int):
        if self._multi:
            raise NotImplementedError(
                "LazyContext is not supported over multiple processes; use "
                "score_masked (batched lazy semantics) or a single-process mesh"
            )
        return super().new_lazy_context(input_vector_count)
