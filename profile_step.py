"""Component-wise timing of the TIP-cat training step on the current device."""
import time

import jax
import jax.numpy as jnp
import optax

from tip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
from tip_tpu.config import ModelConfig
from tip_tpu.data import cached_trigraph, load_decagon_raw
from tip_tpu.train.model import TIP, make_graph_arrays
from tip_tpu.sampling import typed_negative_sampling_chunked

raw = load_decagon_raw()
data = cached_trigraph(raw, split_rate=0.9, seed=1111)
graph, gs = make_graph_arrays(data)
print("n_chunks:", gs.dd_n_chunks, "chunk:", gs.dd_chunk, "valid:", gs.dd_n_valid)

import sys
kd = sys.argv[1] if len(sys.argv) > 1 else "float32"
model = TIP.for_data(ModelConfig.tip_cat(kernel_dtype=kd), data, gs, backend="auto")
print("backend:", model.backend, "kernel_dtype:", kd)
params = model.init(jax.random.key(0))
opt = optax.adam(0.01)
opt_state = opt.init(params)


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(jnp.asarray(leaf))[0])


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        _fetch(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:34s} {dt:8.2f} ms")
    return out


key = jax.random.key(1)

encode_fwd = jax.jit(lambda p, g: model.encode(p, g))
z = timeit("encode fwd", encode_fwd, params, graph)

sample = jax.jit(lambda k, g: typed_negative_sampling_chunked(
    k, g["dd_chunk_type"], g["dd_bitmap"], gs.n_drug, gs.n_et, gs.dd_chunk,
    backend=model.backend))
neg = timeit("neg sampling", sample, key, graph)

score_pos = jax.jit(lambda p, z, g: model.score_padded(
    p, z, g["dd_src2d"], g["dd_dst2d"], g["dd_chunk_type"], sigmoid=False))
timeit("decoder fwd (pos)", score_pos, params, z, graph)

loss_fwd = jax.jit(lambda p, g, k: model.loss(p, g, k))
timeit("loss fwd", loss_fwd, params, graph, key)

grad_fn = jax.jit(lambda p, g, k: jax.value_and_grad(
    lambda q: model.loss(q, g, k))(p))
timeit("loss fwd+bwd", grad_fn, params, graph, key)


@jax.jit
def step(params, opt_state, graph, key):
    loss, grads = jax.value_and_grad(lambda p: model.loss(p, graph, key))(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


timeit("full step", step, params, opt_state, graph, key)

# encoder-only grad (isolates RGCN kernels' bwd from the decoder's)
enc_grad = jax.jit(lambda p, g: jax.value_and_grad(
    lambda q: jnp.sum(model.encode(q, g)))(p))
timeit("encode fwd+bwd", enc_grad, params, graph)
