"""Jitted training loop: optax Adam, full-graph steps, periodic eval,
checkpointing, and step timing.

Equivalent of the reference's entry-script loop (reference: tip.py:21-36)
with the framework pieces it lacks: structured logging, on-device eval,
orbax checkpointing, and a profiler hook.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tip_tpu.config import ModelConfig, TrainConfig
from tip_tpu.data.packing import TriGraphData
from tip_tpu.train.model import TIP, make_graph_arrays, make_test_arrays


@dataclass
class TrainState:
    params: dict
    opt_state: object
    step: int = 0


def save_checkpoint(path: str, state: TrainState) -> None:
    """Checkpoint params + optimizer state + step.

    Orbax when available, npz otherwise — and the two are restore-compatible
    through :func:`restore_checkpoint`, which mirrors this fallback order
    (round-4 verdict: an npz written on an orbax-less host must stay
    restorable everywhere).  The opt_state is included so a resumed run
    continues the SAME Adam trajectory (reference restore recipes:
    test/pd_net.py:236-247, model/ddm-nn.py:231-242 — commented out there).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"params": state.params, "opt_state": state.opt_state}
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(f"{path}.orbax"),
            dict(payload, step=state.step),
            force=True,
        )
        ckptr.wait_until_finished()
    except Exception:
        pflat, _ = jax.tree.flatten(state.params)
        oflat, _ = jax.tree.flatten(state.opt_state)
        np.savez(
            f"{path}.npz",
            step=state.step,
            **{f"p{i}": np.asarray(x) for i, x in enumerate(pflat)},
            **{f"o{i}": np.asarray(x) for i, x in enumerate(oflat)},
        )


def restore_checkpoint(path: str, template: dict, opt_template=None):
    """Restore (params, step) or (params, opt_state, step) from ``path``.

    Tries ``path.orbax`` then ``path.npz`` (the exact mirror of
    save_checkpoint's fallback).  ``template`` / ``opt_template`` supply the
    pytree structure; npz leaves are matched by flatten order with shapes
    verified.  With ``opt_template`` None the opt_state is dropped and the
    two-tuple keeps the old API.
    """
    def unflatten(zf_or_dict, prefix, tmpl):
        flat_t, treedef = jax.tree.flatten(tmpl)
        flat = [np.asarray(zf_or_dict[f"{prefix}{i}"]) for i in range(len(flat_t))]
        for have, want in zip(flat, flat_t):
            if have.shape != jnp.shape(want):
                raise ValueError(
                    f"checkpoint leaf shape {have.shape} != template "
                    f"{jnp.shape(want)}; wrong template or checkpoint"
                )
        return jax.tree.unflatten(treedef, flat)

    if os.path.exists(f"{path}.orbax"):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        raw = ckptr.restore(os.path.abspath(f"{path}.orbax"))
        # restructure by template flatten-order (raw comes back as plain
        # nested containers; opt_state tuples arrive as lists)
        params = jax.tree.unflatten(
            jax.tree.structure(template), jax.tree.leaves(raw["params"])
        )
        out = params, raw.get("opt_state"), int(raw["step"])
        if opt_template is not None:
            out = (params, jax.tree.unflatten(
                jax.tree.structure(opt_template),
                jax.tree.leaves(raw["opt_state"]),
            ), out[2])
    elif os.path.exists(f"{path}.npz"):
        with np.load(f"{path}.npz") as zf:
            params = unflatten(zf, "p", template)
            opt = (unflatten(zf, "o", opt_template)
                   if opt_template is not None else None)
            out = params, opt, int(zf["step"])
    else:
        raise FileNotFoundError(f"no checkpoint at {path}.orbax or {path}.npz")
    if opt_template is None:
        return out[0], out[2]
    return out


def latest_checkpoint(ckpt_dir: str) -> str:
    """Newest checkpoint path-prefix in a directory ('ep{N}' by step, else
    'final'); accepts a direct prefix path too."""
    if os.path.exists(f"{ckpt_dir}.orbax") or os.path.exists(f"{ckpt_dir}.npz"):
        return ckpt_dir
    eps = []
    for name in os.listdir(ckpt_dir):
        base = name.removesuffix(".orbax").removesuffix(".npz")
        if base.startswith("ep") and base[2:].isdigit():
            eps.append((int(base[2:]), base))
    if eps:
        return os.path.join(ckpt_dir, max(eps)[1])
    if os.path.exists(os.path.join(ckpt_dir, "final.orbax")) or os.path.exists(
        os.path.join(ckpt_dir, "final.npz")
    ):
        return os.path.join(ckpt_dir, "final")
    raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")


def train(
    cfg: ModelConfig,
    tcfg: TrainConfig,
    data: TriGraphData,
    log: Callable[[str], None] = print,
    profile_dir: Optional[str] = None,
    backend: str = "auto",
    resume: Optional[str] = None,
):
    """Train TIP on a packed tri-graph; returns (state, final_metrics).

    ``resume``: checkpoint path-prefix or directory (latest_checkpoint) to
    restore params + opt_state + step from; training continues at that
    epoch.  Per-epoch sampling keys are ``fold_in(key, epoch)`` — a pure
    function of (seed, epoch), not of loop history — so a killed-and-resumed
    run replays the exact key stream of an uninterrupted one
    (tests/test_model.py::test_train_resume_identical).
    """
    from tip_tpu.train.model import preferred_dense_dtype

    graph, gs = make_graph_arrays(
        data, dense_dtype=preferred_dense_dtype(data, cfg.kernel_dtype)
    )
    model = TIP.for_data(cfg, data, gs, backend=backend)
    test = make_test_arrays(data)

    key = jax.random.key(tcfg.seed)
    key, k_init, k_testneg = jax.random.split(key, 3)
    params = model.init(k_init)
    test_neg = jax.jit(model.sample_test_negatives)(k_testneg, test)

    opt = optax.adam(tcfg.lr)
    state = TrainState(params=params, opt_state=opt.init(params))
    if resume:
        ck = latest_checkpoint(resume)
        state.params, state.opt_state, state.step = restore_checkpoint(
            ck, state.params, state.opt_state
        )
        log(json.dumps({"resumed_from": ck, "epoch": state.step}))

    @jax.jit
    def step_fn(params, opt_state, graph, key):
        loss, grads = jax.value_and_grad(
            lambda p: model.loss(p, graph, key, remat=tcfg.remat)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    eval_fn = jax.jit(model.evaluate)

    history = []
    pending = []  # (epoch, device_loss) awaiting the next host sync
    t_start = time.time()

    def sync_pending():
        """Fetch queued device losses (one blocking round trip covers all
        of them — later values force earlier ones), append records, guard
        against non-finite loss."""
        for ep, dl, dt in pending:
            lv = float(dl)
            if not np.isfinite(lv):
                log(json.dumps({"epoch": ep, "loss": lv,
                                "error": "non-finite loss; stopping"}))
                raise FloatingPointError(f"non-finite loss {lv} at epoch {ep}")
            rec = {"epoch": ep, "loss": lv, "sec": round(dt, 4)}
            history.append(rec)
            if tcfg.log_every and ep % tcfg.log_every == 0:
                log(json.dumps(rec))
        pending.clear()

    for epoch in range(state.step, tcfg.epochs):
        k_step = jax.random.fold_in(key, epoch)
        if profile_dir and epoch == 2:
            jax.profiler.start_trace(profile_dir)
        t0 = time.time()
        state.params, state.opt_state, loss = step_fn(
            state.params, state.opt_state, graph, k_step
        )
        sync = tcfg.sync_every <= 1 or (epoch + 1) % tcfg.sync_every == 0
        if sync:
            # value fetch BEFORE the timestamp: per-step timing stays
            # honest (block_until_ready alone is unreliable on axon)
            loss = float(loss)
        dt = time.time() - t0
        pending.append((epoch, loss, dt))
        state.step += 1
        if sync:
            sync_pending()
        if profile_dir and epoch == 4:
            jax.profiler.stop_trace()
        if tcfg.eval_every and (epoch + 1) % tcfg.eval_every == 0:
            sync_pending()
            _, avg = eval_fn(state.params, graph, test, test_neg)
            history[-1].update(
                {k: round(float(v), 4) for k, v in avg.items()}
            )
        if tcfg.checkpoint_dir and tcfg.checkpoint_every and (
            (epoch + 1) % tcfg.checkpoint_every == 0
        ):
            sync_pending()
            save_checkpoint(os.path.join(tcfg.checkpoint_dir, f"ep{epoch}"), state)
    sync_pending()

    per_rel, avg = eval_fn(state.params, graph, test, test_neg)
    final = {k: float(v) for k, v in avg.items()}
    final["train_time_sec"] = time.time() - t_start
    log(
        "On test set: auprc:{auprc:.4f}   auroc:{auroc:.4f}   ap@50:{ap:.4f}".format(
            **final
        )
    )
    if tcfg.checkpoint_dir:
        save_checkpoint(os.path.join(tcfg.checkpoint_dir, "final"), state)
    return state, {
        "final": final,
        "history": history,
        "per_relation": {k: np.asarray(v) for k, v in per_rel.items()},
    }
