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
    """Orbax param checkpointing; falls back to npz if orbax is unavailable."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(f"{path}.orbax"),
            {"params": state.params, "step": state.step},
            force=True,
        )
        ckptr.wait_until_finished()
    except Exception:
        flat, treedef = jax.tree.flatten(state.params)
        np.savez(
            f"{path}.npz",
            step=state.step,
            treedef=str(treedef),
            **{f"p{i}": np.asarray(x) for i, x in enumerate(flat)},
        )


def restore_checkpoint(path: str, template: dict):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(f"{path}.orbax"),
        {"params": template, "step": 0},
    )
    return restored["params"], int(restored["step"])


def train(
    cfg: ModelConfig,
    tcfg: TrainConfig,
    data: TriGraphData,
    log: Callable[[str], None] = print,
    profile_dir: Optional[str] = None,
    backend: str = "auto",
):
    """Train TIP on a packed tri-graph; returns (state, final_metrics)."""
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

    @jax.jit
    def step_fn(params, opt_state, graph, key):
        loss, grads = jax.value_and_grad(
            lambda p: model.loss(p, graph, key, remat=tcfg.remat)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    eval_fn = jax.jit(model.evaluate)

    history = []
    t_start = time.time()
    for epoch in range(tcfg.epochs):
        key, k_step = jax.random.split(key)
        if profile_dir and epoch == 2:
            jax.profiler.start_trace(profile_dir)
        t0 = time.time()
        state.params, state.opt_state, loss = step_fn(
            state.params, state.opt_state, graph, k_step
        )
        loss = float(loss)  # blocks; per-step timing stays honest
        dt = time.time() - t0
        if not np.isfinite(loss):
            log(json.dumps({"epoch": epoch, "loss": loss, "error": "non-finite loss; stopping"}))
            raise FloatingPointError(f"non-finite loss {loss} at epoch {epoch}")
        if profile_dir and epoch == 4:
            jax.profiler.stop_trace()
        state.step += 1
        rec = {"epoch": epoch, "loss": loss, "sec": round(dt, 4)}
        if tcfg.eval_every and (epoch + 1) % tcfg.eval_every == 0:
            _, avg = eval_fn(state.params, graph, test, test_neg)
            rec.update({k: round(float(v), 4) for k, v in avg.items()})
        history.append(rec)
        if tcfg.log_every and epoch % tcfg.log_every == 0:
            log(json.dumps(rec))
        if tcfg.checkpoint_dir and tcfg.checkpoint_every and (
            (epoch + 1) % tcfg.checkpoint_every == 0
        ):
            save_checkpoint(os.path.join(tcfg.checkpoint_dir, f"ep{epoch}"), state)

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
