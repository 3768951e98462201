"""Disentangle device step time from host<->device round-trip latency.

Under the axon tunnel a single value fetch costs O(100ms-1s); timing K
chained steps + one fetch and fitting elapsed(K) = a + b*K gives the true
per-step device time b and the fixed round-trip a.  Used to validate
bench.py's n_steps choice.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import optax

from tip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
from tip_tpu.config import ModelConfig
from tip_tpu.data import cached_trigraph, load_decagon_raw
from tip_tpu.train.model import TIP, make_graph_arrays

kd = sys.argv[1] if len(sys.argv) > 1 else "float32"
dense = len(sys.argv) > 2 and sys.argv[2] == "dense"
raw = load_decagon_raw()
data = cached_trigraph(raw, split_rate=0.9, seed=1111)
graph, gs = make_graph_arrays(data, dense_dtype=kd if dense else None)
print("dense:", dense)
model = TIP.for_data(ModelConfig.tip_cat(kernel_dtype=kd), data, gs,
                     backend="auto")
params = model.init(jax.random.key(0))
opt = optax.adam(0.01)
opt_state = opt.init(params)


@jax.jit
def step(params, opt_state, graph, key):
    loss, grads = jax.value_and_grad(lambda p: model.loss(p, graph, key))(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


def run(k):
    global params, opt_state
    key = jax.random.key(1)
    t0 = time.perf_counter()
    for _ in range(k):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, graph, sub)
    float(loss)
    return time.perf_counter() - t0


run(3)  # compile + warm
for k in (1, 1, 10, 10, 40, 40):
    print(f"k={k:3d}  elapsed={run(k):.3f}s")
