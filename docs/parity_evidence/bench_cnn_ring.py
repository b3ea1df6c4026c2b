"""Round-4 visual-pipeline ladder: legacy stacking vs frame-ring on the chip.

Usage: python docs/parity_evidence/bench_cnn_ring.py [variant ...]
Variants: legacy ring ring_dedup (default: all), xN env-count suffix via
CNN_ENVS=N. Prints one line per variant with env-steps/s.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/pearl_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from pearl_tpu.agent import PearlAgent
from pearl_tpu.envs import SyntheticAtari
from pearl_tpu.history_summarization_modules import (
    FrameRingHistorySummarization,
    StackingHistorySummarization,
)
from pearl_tpu.neural_networks.q_value_networks import CNNQValueNetwork
from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
from pearl_tpu.replay_buffers.visual import VisualReplayBuffer
from pearl_tpu.training.throughput import make_compiled_runner

B = int(os.environ.get("CNN_ENVS", 1024))
CALLS = int(os.environ.get("CNN_CALLS", 5))


def build(variant):
    if variant == "legacy":
        summ = StackingHistorySummarization(history_length=4, include_action=False)
        dedup = False
        obs_dtype = None
    else:
        summ = FrameRingHistorySummarization(history_length=4, dtype=jnp.bfloat16)
        dedup = variant in ("ring_dedup", "ring_cache")
        obs_dtype = jnp.bfloat16
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            q_network=CNNQValueNetwork(
                input_shape=(84, 84, 4), time_major_stack=True,
                conv1_cache=(variant == "ring_cache"),
            ),
            training_rounds=1,
            batch_size=512,
            act_dtype="bfloat16",
            history_summarizer=summ,
        ),
        replay_buffer=VisualReplayBuffer(
            capacity=8 * B, stack=4, num_envs=B,
            frame_dtype=jnp.bfloat16, dedup_next=dedup,
        ),
    )
    env = SyntheticAtari(frames=1, obs_dtype=obs_dtype)
    return agent, env


def measure(variant):
    learn = not variant.endswith("_nolearn")
    agent, env = build(variant.replace("_nolearn", ""))
    init_fn, run_fn = make_compiled_runner(
        agent, env, num_envs=B, steps_per_learn=8, learns_per_call=8,
        learn=learn,
    )
    key = jax.random.PRNGKey(0)
    t = time.perf_counter()
    astate, env_states = init_fn(key)
    jax.block_until_ready(env_states)
    print(f"# {variant}: init {time.perf_counter()-t:.1f}s", flush=True)
    t = time.perf_counter()
    astate, env_states, stats = run_fn(astate, env_states, jax.random.PRNGKey(1))
    jax.block_until_ready(stats)
    print(f"# {variant}: warmup {time.perf_counter()-t:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(CALLS):
        astate, env_states, stats = run_fn(astate, env_states, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(stats)
    el = time.perf_counter() - t0
    prof_dir = os.environ.get("CNN_PROFILE_DIR")
    if prof_dir:
        jax.profiler.start_trace(f"{prof_dir}/{variant}")
        astate, env_states, stats = run_fn(astate, env_states, jax.random.PRNGKey(99))
        jax.block_until_ready(stats)
        jax.profiler.stop_trace()
        print(f"# {variant}: trace -> {prof_dir}/{variant}", flush=True)
    sps = CALLS * 8 * 8 * B / el
    print(
        f"{variant}: envs={B} {sps:,.0f} env-steps/s "
        f"({el:.2f}s, episodes={int(stats['episodes'])})",
        flush=True,
    )
    return sps


if __name__ == "__main__":
    variants = sys.argv[1:] or ["legacy", "ring", "ring_dedup"]
    for v in variants:
        measure(v)
