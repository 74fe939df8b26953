"""Trainer: Adam warmup then L-BFGS, chunked jitted stepping.

Parity target: ``NeuralNetwork.fit`` (reference
utils/neuralnetwork.py:105-149) — Adam for ``tf_epochs`` then L-BFGS
for ``nt_epochs`` over a flat parameter vector, with logger lines every
``log_frequency`` epochs and the injected error metric at train end.

TPU-first: both phases advance in compiled chunks of ``log_frequency``
steps (``lax.scan`` for Adam, ``lax.while_loop`` for L-BFGS); the host
loop only logs and checks the L-BFGS termination flag between chunks,
so the hot path never leaves the device.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from pinn import params as pcodec
from pinn.optim.adam import AdamRunner
from pinn.optim import lbfgs as lb
from pinn.utils.logger import Logger


def lbfgs_config_from_hp(hp: dict) -> lb.LbfgsConfig:
    import numpy as np
    return lb.LbfgsConfig(
        learning_rate=hp.get("nt_lr", 0.8),
        max_iter=hp.get("nt_epochs", 0),
        n_correction=hp.get("nt_ncorr", 50),
        tol_fun=float(np.finfo(np.float64).eps),
        line_search=hp.get("nt_line_search", "none"),
        # "matrix": MXU-form two-loop (identical algebra, ~4m fewer
        # device ops per iteration — the throughput choice); "scan"
        # default keeps reference-trajectory bit-stability.
        dir_impl=hp.get("nt_dir_impl", "scan"),
        # With a line search, restart (clear history) on non-descent
        # directions instead of stopping; strict-parity "none" keeps
        # the reference's stop-on-no-progress behavior.
        restart=hp.get("nt_restart",
                       hp.get("nt_line_search", "none") != "none"),
    )


def _shard_batch(batch, mesh):
    """Shard each batch array along its leading (point) axis when that
    axis divides the mesh; replicate the rest.

    The big collocation set is the scaling axis and must divide (pad it
    with ``pinn.parallel.pad_points_with_weights`` + the losses'
    ``f_weights`` otherwise); small data/boundary stacks (N_u ~ 100)
    are cheaper replicated than padded, and their loss terms stay
    bit-exact.  GSPMD inserts the ICI reductions either way.
    """
    from pinn.parallel import replicate, shard_points
    n = mesh.devices.size

    def place(a):
        if jnp.ndim(a) >= 1 and a.shape[0] % n == 0:
            return shard_points(a, mesh)
        return replicate(a, mesh)

    return jax.tree_util.tree_map(place, batch)


class Trainer:
    """Drives ``loss_fn(params, batch) -> scalar`` through both phases.

    The batch pytree holds every data/collocation array; it is passed
    as a jit argument on each chunk (never closed over — see
    pinn.optim.adam docstring).

    ``epoch_extra(params) -> str`` (optional) is appended to log lines —
    the identification experiments use it to print lambda values
    (reference ide_disc_burgers.py:165-168).
    """

    # Compiled steps per device dispatch. Capped low: compile time on
    # the remote TPU compile service scales with the scan/while body
    # trip count, and at ~10 ms/iteration a 10-step dispatch already
    # amortizes host round-trips.
    CHUNK_CAP = 10

    def __init__(self, loss_fn: Callable[[Any, Any], jnp.ndarray], params0,
                 batch: Any, hp: dict, logger: Optional[Logger] = None,
                 epoch_extra: Optional[Callable[[Any], str]] = None,
                 mesh=None, resample_fn: Optional[Callable[[int], Any]] = None,
                 params_callback: Optional[Callable[[Any], None]] = None,
                 adam_loss_fn: Optional[Callable[[Any, Any],
                                                 jnp.ndarray]] = None,
                 val_fn: Optional[Callable[[Any], float]] = None):
        # adam_loss_fn (optional): a cheaper warmup-phase loss — e.g.
        # the bf16-stream fused kernel — optimized during the Adam
        # phase only; L-BFGS always refines against loss_fn (warmup-
        # grade precision must not leak into the quasi-Newton stage).
        #
        # val_fn (optional): label-free validation metric
        # ``val_fn(params) -> float`` (e.g. residual SSE on a held-out
        # collocation draw), probed every hp["nt_val_every"] L-BFGS
        # iterations; at phase end the best-scoring iterate is restored.
        # Motivation (measured, logs/df32_ab.log): refinement tails
        # overshoot — from one stage-1 checkpoint a 4k df32 tail lands
        # at 6.73e-4 rel-L2 but 10k lands at 8.30e-4 at the SAME train
        # loss, i.e. the extra iterations overfit the fixed collocation
        # draw.  Best-iterate selection converts that from a tuning
        # hazard into a controlled stop without touching exact-solution
        # labels.
        self.loss_fn = loss_fn
        self.val_fn = val_fn
        self.mesh = mesh
        # Called with the current params pytree right before every log
        # line (and at train end) — lets facades/error_fn closures track
        # the live iterate without reaching into Trainer internals.
        self.params_callback = params_callback
        # resample_fn(round) -> fresh batch pytree.  Driven by the
        # hp keys "tf_resample" / "nt_resample" (epochs between
        # collocation refreshes in each phase; 0/absent = off).  A
        # fixed LHS draw is what the optimizer overfits to — periodic
        # redraws break that floor (the L-BFGS history is reset on
        # refresh since the old curvature pairs describe a different
        # loss surface).
        self.resample_fn = resample_fn
        if mesh is not None:
            batch = _shard_batch(batch, mesh)
            from pinn.parallel import replicate
            params0 = replicate(params0, mesh)
        self.batch = batch
        self.params = params0
        self.hp = hp
        self.logger = logger
        self.epoch_extra = epoch_extra
        self.tf_epochs = hp.get("tf_epochs", 0)
        self.nt_config = lbfgs_config_from_hp(hp)
        self.frequency = hp.get("log_frequency", 10)
        # Fault tolerance: hp["save_every"] (epochs) + hp["save_checkpoint"]
        # (path) make the Trainer persist the current iterate at that
        # cadence via an atomic write (pinn.utils.checkpoint
        # .save_npz_atomic).  On a crash, restarting the run with
        # hp["init_checkpoint"] pointing at the same file warm-resumes
        # from the last save; optimizer state is rebuilt at the saved
        # iterate — the same semantics the resample refresh already uses
        # for L-BFGS (the reference persists nothing, SURVEY.md §5).
        self.save_every = int(hp.get("save_every", 0) or 0)
        self.save_path = hp.get("save_checkpoint")
        if self.save_every and not self.save_path:
            raise ValueError("hp['save_every'] requires hp['save_checkpoint'] "
                             "(the path periodic saves write to)")
        self.adam = (AdamRunner(adam_loss_fn or loss_fn, hp)
                     if self.tf_epochs > 0 else None)
        self.last_lbfgs_state: Optional[lb.LbfgsState] = None

    # -- logging helpers ---------------------------------------------------
    def _log(self, method: str, *args, **kw):
        if self.params_callback is not None:
            self.params_callback(self.params)
        if self.logger is not None:
            getattr(self.logger, method)(*args, **kw)

    def _extra(self) -> str:
        return self.epoch_extra(self.params) if self.epoch_extra else ""

    def summary(self) -> str:
        """Param-shape report printed by the logger when
        hp["model_description"] is set (reference logger.py:42-43)."""
        leaves = jax.tree_util.tree_leaves_with_path(self.params)
        total = sum(int(jnp.size(v)) for _, v in leaves)
        lines = [f"  {jax.tree_util.keystr(k)}: {tuple(v.shape)} "
                 f"{jnp.dtype(v.dtype).name}" for k, v in leaves]
        lines.append(f"  total parameters: {total}")
        return "\n".join(lines)

    def _maybe_save(self, phase: str, phase_done: int) -> None:
        """Periodic checkpoint at a ``save_every`` boundary.  ``epoch``
        in the metadata is global (Adam epochs count first, then
        L-BFGS iterations), so a resume driver can compute the
        remaining schedule."""
        if not (self.save_every and phase_done % self.save_every == 0
                and phase_done):
            return
        from pinn.utils import checkpoint
        epoch = phase_done + (self.tf_epochs if phase == "lbfgs" else 0)
        checkpoint.save_npz_atomic(
            self.save_path, self.params,
            extra={"phase": phase, "epoch": int(epoch),
                   "phase_epoch": int(phase_done)})

    def _resample(self, round_idx: int) -> None:
        batch = self.resample_fn(round_idx)
        if self.mesh is not None:
            batch = _shard_batch(batch, self.mesh)
        self.batch = batch

    # -- phases ------------------------------------------------------------
    def _adam_phase(self):
        self._log("log_train_opt", "Adam")
        opt_state = self.adam.init(self.params)
        every = self.hp.get("tf_resample", 0) if self.resample_fn else 0
        done = 0
        while done < self.tf_epochs:
            if every and done and done % every == 0:
                self._resample(done)
            # Land exactly on log boundaries even when log_frequency
            # is not a multiple of CHUNK_CAP.
            chunk = min(self.CHUNK_CAP, self.tf_epochs - done,
                        self.frequency - (done % self.frequency))
            if every:
                chunk = min(chunk, every - (done % every))
            if self.save_every:
                chunk = min(chunk, self.save_every - (done % self.save_every))
            self.params, opt_state, losses = self.adam.run(
                self.params, opt_state, self.batch, chunk)
            # losses[0] is the loss at epoch `done` (pre-update), i.e.
            # the value the reference logs for that epoch.
            if done % self.frequency == 0:
                self._log("log_train_epoch", done, float(losses[0]),
                          self._extra(), False)
            done += chunk
            self._maybe_save("adam", done)

    def _lbfgs_phase(self):
        if self.nt_config.max_iter == 0:
            return
        self._log("log_train_opt", "LBFGS")
        flat, unravel = pcodec.ravel_with_unravel(self.params)

        # Mixed precision: hp["nt_vector_dtype"]="float64" keeps the
        # L-BFGS iterate/gradient/history algebra in f64 (the
        # curvature pair y = g - g_old is cancellation-prone) while the
        # expensive network/residual evaluation stays in the model
        # dtype.  Requires jax x64 mode.
        vec_dtype = self.hp.get("nt_vector_dtype")
        net_dtype = jax.tree_util.tree_leaves(self.params)[0].dtype
        if vec_dtype is not None and jnp.dtype(vec_dtype) != net_dtype:
            vec_dtype = jnp.dtype(vec_dtype)
            flat = flat.astype(vec_dtype)

            def opfunc(w, batch):
                def cast_loss(w_):
                    p = unravel(w_.astype(net_dtype))
                    return self.loss_fn(p, batch).astype(vec_dtype)
                return jax.value_and_grad(cast_loss)(w)

            def lossfunc(w, batch):
                p = unravel(w.astype(net_dtype))
                return self.loss_fn(p, batch).astype(vec_dtype)

            def to_params(x):
                return unravel(x.astype(net_dtype))
        else:
            def opfunc(w, batch):
                return jax.value_and_grad(
                    lambda w_: self.loss_fn(unravel(w_), batch))(w)

            def lossfunc(w, batch):
                return self.loss_fn(unravel(w), batch)

            to_params = unravel

        state = lb.lbfgs_init(opfunc, flat, self.nt_config, self.batch)
        run = lb.make_lbfgs_run(opfunc, self.nt_config, lossfunc)
        every = self.hp.get("nt_resample", 0) if self.resample_fn else 0
        done = 0
        resampled_at = -1

        val_every = (int(self.hp.get("nt_val_every", 0) or 0)
                     if self.val_fn is not None else 0)
        val_best = None  # (metric, flat iterate, nt_epoch)

        def val_probe(x, it):
            nonlocal val_best
            v = float(self.val_fn(to_params(x)))
            if val_best is None or v < val_best[0]:
                val_best = (v, x, it)

        if val_every:
            # The warm-start iterate is a candidate too: a tail that
            # only overfits must not end worse than it began.
            val_probe(state.x, 0)

        def refresh(i):
            # Fresh collocation draw: the loss surface changed, so
            # restart the quasi-Newton model at the current iterate
            # (history/curvature pairs describe the old surface).
            self._resample(i)
            return lb.lbfgs_init(opfunc, state.x, self.nt_config, self.batch)

        while done < self.nt_config.max_iter:
            if int(state.reason) != lb.RUNNING:
                # Terminal on the current draw.  With resampling on,
                # a stall (f-tol / no-progress) on one draw is not
                # convergence of the true loss — revive on a fresh
                # batch, unless this draw already started here.
                if not every or done == resampled_at:
                    break
                state, resampled_at = refresh(done), done
            elif every and done and done % every == 0 and done != resampled_at:
                state, resampled_at = refresh(done), done
            chunk = min(self.CHUNK_CAP, self.nt_config.max_iter - done,
                        self.frequency - (done % self.frequency))
            if every:
                chunk = min(chunk, every - (done % every))
            if self.save_every:
                chunk = min(chunk, self.save_every - (done % self.save_every))
            if val_every:
                chunk = min(chunk, val_every - (done % val_every))
            state, f_hist = run(state, self.batch, chunk)
            done += chunk
            self.params = to_params(state.x)
            self._maybe_save("lbfgs", done)
            if val_every and done % val_every == 0:
                val_probe(state.x, done)
            if done % self.frequency == 0:
                self._log("log_train_epoch", done, float(f_hist[-1]),
                          self._extra(), True)
        self.params = to_params(state.x)
        if val_every:
            val_probe(state.x, done)
            if val_best[1] is not state.x:
                self.params = to_params(val_best[1])
                if self.logger is not None:
                    self.logger._print(
                        f"-- val select: restored nt_epoch "
                        f"{val_best[2]} iterate (val {val_best[0]:.4e}) "
                        f"over final --")
        self.last_lbfgs_state = state
        reason = int(state.reason)
        if reason != lb.RUNNING and self.logger is not None:
            self.logger._print(
                f"-- LBFGS stopped after {int(state.n_iter)} iterations: "
                f"{lb.REASON_NAMES.get(reason, reason)} --")

    def fit(self):
        """Run both phases.  With hp["trace_dir"] set, the whole run is
        captured as a jax.profiler trace (open with TensorBoard or
        Perfetto) — the reference only had wall-clock prints
        (SURVEY.md §5 tracing row)."""
        trace_dir = self.hp.get("trace_dir")
        ctx = (jax.profiler.trace(trace_dir) if trace_dir
               else contextlib.nullcontext())
        with ctx:
            self._log("log_train_start", self,
                      model_description=self.hp.get("model_description",
                                                    False))
            if self.tf_epochs > 0:
                self._adam_phase()
            self._lbfgs_phase()
        self._log("log_train_end",
                  self.tf_epochs + self.nt_config.max_iter, self._extra())
        return self.params
