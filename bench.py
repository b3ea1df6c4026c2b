"""Throughput benchmark: fully-fused DQN actor-learner on vectorized CartPole.

Measures aggregate env-steps/s of the compiled act -> env.step -> replay.push
-> (sample -> gradient step) loop on the available accelerator. North star:
>=1M env-steps/s (BASELINE.md; the reference's step-at-a-time Python loop
does ~1e3-1e4 steps/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the ratio against the 1M steps/s north-star target.

Env overrides: BENCH_NUM_ENVS, BENCH_LEARNS_PER_CALL, BENCH_STEPS_PER_LEARN,
BENCH_CALLS.
"""

import json
import os
import sys
import time


def main():
    import jax

    # Persistent compilation cache: the fused runner takes minutes to compile
    # through this container's remote-compile tunnel; cache it across runs.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/pearl_tpu_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from pearl_tpu.agent import PearlAgent
    from pearl_tpu.envs import CartPole
    from pearl_tpu.neural_networks.q_value_networks import (
        MultiHeadQValueNetwork,
        VanillaQValueNetwork,
    )
    from pearl_tpu.policy_learners.sequential_decision_making import DeepQLearning
    from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
    from pearl_tpu.training.throughput import make_compiled_runner

    # 128k envs: replay-push scaling continues well past 16384 envs/chip
    # (216M @16k -> 370M @32k -> 446M @64k -> 489M @128k steps/s on v5e;
    # 256k regresses to 465M — docs/ROADMAP.md). Capacity keeps the ring
    # >= 2 learn-cycles deep so every push stays on the contiguous fast path.
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 131_072))
    steps_per_learn = int(os.environ.get("BENCH_STEPS_PER_LEARN", 8))
    # 64 learn-chunks per dispatch: at >30M steps/s a smaller program is
    # dominated by per-call host->TPU dispatch latency, not device time.
    learns_per_call = int(os.environ.get("BENCH_LEARNS_PER_CALL", 64))
    calls = int(os.environ.get("BENCH_CALLS", 10))
    capacity = int(os.environ.get("BENCH_CAPACITY", 2_097_152))
    batch_size = int(os.environ.get("BENCH_BATCH_SIZE", 1024))

    # Multi-head Q (state -> |A| values, reference VanillaQValueMultiHeadNetwork)
    # is the TPU-first DQN shape: one B-row matmul per step instead of the
    # concat state-action net's B*A rows. 230M vs 111M steps/s at 16k envs;
    # converges to the same CartPole target (tests/integration).
    qnet = (
        MultiHeadQValueNetwork()
        if os.environ.get("BENCH_QNET", "multihead") == "multihead"
        else VanillaQValueNetwork()
    )
    # BENCH_ACT_DTYPE=bfloat16 turns on act-path mixed precision (the act
    # forward's activations are the dominant HBM traffic at 128k envs —
    # docs/DESIGN.md §4); learning stays f32.
    act_dtype = os.environ.get("BENCH_ACT_DTYPE") or None
    # BENCH_BUFFER=packed stores the whole transition in one (capacity, F)
    # ring: ONE dynamic_update_slice per push instead of one per field —
    # targeting the ~110us/step observe/push residual (docs/DESIGN.md §4).
    if os.environ.get("BENCH_BUFFER") == "packed":
        from pearl_tpu.replay_buffers.packed import PackedReplayBuffer

        buffer = PackedReplayBuffer(capacity=capacity)
    else:
        buffer = BasicReplayBuffer(capacity=capacity)
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            q_network=qnet,
            training_rounds=1,
            batch_size=batch_size,
            act_dtype=act_dtype,
        ),
        replay_buffer=buffer,
    )
    # BENCH_DEFERRED=1: chunk-granular replay writes — each chunk's
    # transitions are collected in the scan's stacked outputs and written to
    # the ring in ONE contiguous push (1/steps_per_learn the dynamic writes).
    deferred = os.environ.get("BENCH_DEFERRED") == "1" or None
    init_fn, run_fn = make_compiled_runner(
        agent,
        CartPole(),
        num_envs=num_envs,
        steps_per_learn=steps_per_learn,
        learns_per_call=learns_per_call,
        deferred_push=deferred,
    )
    key = jax.random.PRNGKey(0)
    t_init = time.perf_counter()
    astate, env_states = init_fn(key)
    jax.block_until_ready(env_states)
    print(f"# init done in {time.perf_counter()-t_init:.1f}s", file=sys.stderr, flush=True)

    # Warmup (compilation + first execution).
    t_warm = time.perf_counter()
    astate, env_states, stats = run_fn(astate, env_states, jax.random.PRNGKey(1))
    jax.block_until_ready(stats)
    print(f"# warmup (compile) done in {time.perf_counter()-t_warm:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for i in range(calls):
        astate, env_states, stats = run_fn(
            astate, env_states, jax.random.PRNGKey(2 + i)
        )
    jax.block_until_ready(stats)
    elapsed = time.perf_counter() - t0

    total_steps = calls * learns_per_call * steps_per_learn * num_envs
    steps_per_sec = total_steps / elapsed
    print(
        json.dumps(
            {
                "metric": "dqn_cartpole_env_steps_per_s",
                "value": round(steps_per_sec, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(steps_per_sec / 1e6, 3),
            }
        ),
        flush=True,
    )
    print(
        f"# device={jax.devices()[0]} num_envs={num_envs} "
        f"steps_per_learn={steps_per_learn} learns_per_call={learns_per_call} "
        f"calls={calls} elapsed={elapsed:.2f}s episodes={int(stats['episodes'])}",
        file=sys.stderr,
    )

    # Second line: the USER-FACING driver (training/online.py) end-to-end with
    # early stopping active (stats="summary": device-side episode accounting,
    # an unreachable target_return so the full budget runs). Same workload.
    from pearl_tpu.training.online import online_learning

    env = CartPole()
    spd = num_envs * steps_per_learn * learns_per_call  # steps per dispatch
    t_warm = time.perf_counter()
    online_learning(
        agent, env, num_envs=num_envs, max_steps=spd * 2,
        learn_every_k_steps=steps_per_learn, chunks_per_dispatch=learns_per_call,
        seed=0, target_return=1e9, target_window=20, stats="summary",
    )
    print(
        f"# online_learning warmup done in {time.perf_counter()-t_warm:.1f}s",
        file=sys.stderr, flush=True,
    )
    online_calls = int(os.environ.get("BENCH_ONLINE_CALLS", 40))
    t0 = time.perf_counter()
    res = online_learning(
        agent, env, num_envs=num_envs, max_steps=spd * online_calls,
        learn_every_k_steps=steps_per_learn, chunks_per_dispatch=learns_per_call,
        seed=1, target_return=1e9, target_window=20, stats="summary",
    )
    online_sps = res.total_steps / (time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "metric": "online_learning_driver_env_steps_per_s",
                "value": round(online_sps, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(online_sps / 1e6, 3),
            }
        )
    )
    print(
        f"# online_learning driver: {res.total_steps} steps, "
        f"{res.total_episodes} episodes, early-stop active",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
