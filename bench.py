"""Throughput benchmarks: fused actor-learner loops on the available
accelerator, multi-workload.

Prints ONE JSON line per workload, each
{"metric", "value", "unit", "vs_baseline"}; vs_baseline is the ratio against
the 1M steps/s north-star target (BASELINE.md; the reference's step-at-a-time
Python loop does ~1e3-1e4 steps/s). Workloads, in order:

1. dqn_cartpole_env_steps_per_s       — headline fused DQN (128k envs)
2. cnn_dqn_atari84_env_steps_per_s    — CNN-DQN at Atari-native 84x84x4
                                        (reference conv stack) on synthetic
                                        frames; the MXU workload
3. csac_pendulum_env_steps_per_s      — continuous SAC (Gaussian tanh actor
                                        + twin critic + alpha autotune)
4. online_learning_driver_env_steps_per_s — the USER-FACING driver with
                                        early stopping active (printed LAST:
                                        the driver's recorded "parsed" line)

Every metric line carries `n`/`min`/`max` from the repeat-window protocol
(see `_sample_until_stable`); the curves line additionally carries
`episodes_dropped`/`episodes_total`/`curve_capacity`.

Env overrides: BENCH_NUM_ENVS, BENCH_LEARNS_PER_CALL, BENCH_STEPS_PER_LEARN,
BENCH_CALLS, BENCH_CAPACITY, BENCH_BATCH_SIZE, BENCH_QNET, BENCH_ACT_DTYPE,
BENCH_BUFFER=packed, BENCH_DEFERRED=1, BENCH_ONLINE_CALLS,
BENCH_CURVE_CAPACITY, BENCH_MIN_REPS / BENCH_MAX_REPS / BENCH_REL_ERR /
BENCH_MIN_WINDOW_S (repeat-window protocol), BENCH_SKIP_EXTRAS=1 (headline +
driver only), BENCH_TIME_BUDGET (seconds; extras are skipped once exceeded so
the driver metric always lands), BENCH_PLATFORM=cpu (CPU smoke run — sets the
jax platform at config level, which the axon sitecustomize would otherwise
override).
"""

import json
import math
import os
import sys
import time

_T0 = time.perf_counter()


def _emit(metric, steps_per_sec, samples=None, **extra):
    """One JSON line per metric. `value` is the mean over repeated timing
    windows; `n`/`min`/`max` expose the spread (round-4 verdict: sub-second
    unreplicated windows hid a 1.5x CSAC spread between runs)."""
    rec = {
        "metric": metric,
        "value": round(steps_per_sec, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(steps_per_sec / 1e6, 3),
    }
    if samples:
        rec["n"] = len(samples)
        rec["min"] = round(min(samples), 1)
        rec["max"] = round(max(samples), 1)
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def _note(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


# Repeat-window protocol: each sample is one timed group of calls; sampling
# continues until the standard error of the mean is under BENCH_REL_ERR (5%)
# with >= BENCH_MIN_REPS samples and >= BENCH_MIN_WINDOW_S of total timed
# work, bounded by BENCH_MAX_REPS and the global time budget.
_MIN_REPS = int(os.environ.get("BENCH_MIN_REPS", 4))
_MAX_REPS = int(os.environ.get("BENCH_MAX_REPS", 12))
_REL_ERR = float(os.environ.get("BENCH_REL_ERR", 0.05))
_MIN_WINDOW_S = float(os.environ.get("BENCH_MIN_WINDOW_S", 5.0))


def _sample_until_stable(run_group, steps_per_group, label, budget):
    """run_group(i) -> None executes one synchronized timing group; returns
    (mean_sps, samples)."""
    samples = []
    timed_total = 0.0
    while True:
        t0 = time.perf_counter()
        run_group(len(samples))
        dt = time.perf_counter() - t0
        timed_total += dt
        samples.append(steps_per_group / dt)
        n = len(samples)
        if n >= _MIN_REPS and timed_total >= _MIN_WINDOW_S:
            mean = sum(samples) / n
            var = sum((s - mean) ** 2 for s in samples) / (n - 1)
            stderr = math.sqrt(var / n)
            if stderr < _REL_ERR * mean:
                break
        if n >= _MAX_REPS or not _budget_left(budget):
            break
    mean = sum(samples) / len(samples)
    _note(
        f"{label}: n={len(samples)} windows, {timed_total:.2f}s timed, "
        f"mean={mean:,.0f} min={min(samples):,.0f} max={max(samples):,.0f}"
    )
    return mean, samples


def _measure_fused(agent, env, *, num_envs, steps_per_learn, learns_per_call,
                   calls, deferred_push=None, label="", budget=float("inf")):
    import jax

    from pearl_tpu.training.throughput import make_compiled_runner

    init_fn, run_fn = make_compiled_runner(
        agent, env, num_envs=num_envs, steps_per_learn=steps_per_learn,
        learns_per_call=learns_per_call, deferred_push=deferred_push,
    )
    key = jax.random.PRNGKey(0)
    t = time.perf_counter()
    astate, env_states = init_fn(key)
    jax.block_until_ready(env_states)
    _note(f"{label}: init {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    astate, env_states, stats = run_fn(astate, env_states, jax.random.PRNGKey(1))
    jax.block_until_ready(stats)
    _note(f"{label}: warmup (compile) {time.perf_counter()-t:.1f}s")

    state = {"astate": astate, "env_states": env_states}

    def run_group(g):
        astate, env_states, stats = state["astate"], state["env_states"], None
        for i in range(calls):
            astate, env_states, stats = run_fn(
                astate, env_states, jax.random.PRNGKey(2 + g * calls + i)
            )
        jax.block_until_ready(stats)
        state["astate"], state["env_states"] = astate, env_states

    steps_per_group = calls * learns_per_call * steps_per_learn * num_envs
    return _sample_until_stable(run_group, steps_per_group, label, budget)


def _budget_left(budget):
    return (time.perf_counter() - _T0) < budget


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    # Persistent compilation cache: fused runners take minutes to compile
    # through this container's remote-compile tunnel; cache across runs.
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

    budget = float(os.environ.get("BENCH_TIME_BUDGET", 2100))
    skip_extras = os.environ.get("BENCH_SKIP_EXTRAS") == "1"

    # ---- 1. Headline: fused multi-head DQN on vectorized CartPole ----------
    # 128k envs: replay-push scaling continues well past 16384 envs/chip
    # (216M @16k -> 489M @128k steps/s on v5e; 256k regresses — ROADMAP.md).
    # Capacity keeps the ring >= 2 learn-cycles deep so pushes stay on the
    # contiguous fast path.
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 131_072))
    steps_per_learn = int(os.environ.get("BENCH_STEPS_PER_LEARN", 8))
    learns_per_call = int(os.environ.get("BENCH_LEARNS_PER_CALL", 64))
    calls = int(os.environ.get("BENCH_CALLS", 10))
    capacity = int(os.environ.get("BENCH_CAPACITY", 2_097_152))
    batch_size = int(os.environ.get("BENCH_BATCH_SIZE", 1024))

    # Multi-head Q (state -> |A| values, reference VanillaQValueMultiHeadNetwork)
    # is the TPU-first DQN shape: one B-row matmul per act instead of the
    # concat state-action net's B*A rows (215.8M vs 111M at 16k envs).
    qnet = (
        MultiHeadQValueNetwork()
        if os.environ.get("BENCH_QNET", "multihead") == "multihead"
        else VanillaQValueNetwork()
    )
    act_dtype = os.environ.get("BENCH_ACT_DTYPE") or None
    # Measured NEGATIVES kept as opt-in flags (docs/PARITY.md): BENCH_BUFFER=
    # packed (415.7M vs 489.7M — the pack concat costs more than the per-field
    # writes save) and BENCH_DEFERRED=1 (408.1M — scan-stacking writes the
    # transition twice). Basic per-step push is the measured winner.
    if os.environ.get("BENCH_BUFFER") == "packed":
        from pearl_tpu.replay_buffers.packed import PackedReplayBuffer

        buffer = PackedReplayBuffer(capacity=capacity)
    else:
        buffer = BasicReplayBuffer(capacity=capacity)
    deferred = os.environ.get("BENCH_DEFERRED") == "1" or None
    agent = PearlAgent(
        policy_learner=DeepQLearning(
            q_network=qnet,
            training_rounds=1,
            batch_size=batch_size,
            act_dtype=act_dtype,
        ),
        replay_buffer=buffer,
    )
    sps, smp = _measure_fused(
        agent, CartPole(), num_envs=num_envs, steps_per_learn=steps_per_learn,
        learns_per_call=learns_per_call, calls=calls, deferred_push=deferred,
        label="dqn", budget=budget,
    )
    _emit("dqn_cartpole_env_steps_per_s", sps, smp)
    _note(f"device={jax.devices()[0]} num_envs={num_envs}")

    # ---- 2. CNN-DQN at Atari-native 84x84x4 (visual pipeline) --------------
    # Measured ladder (PARITY.md round-5, 20-call windows): stacking
    # summarizer 0.402M -> FrameRing O(1) circular window + dedup_next
    # 0.736M -> + in-place Pallas ring write + push fence 0.827M steps/s.
    # dedup_next is EXACT since round 5 (truncated rows' final frames come
    # from the frame_t side ring); the frame-ring path is bit-equal to the
    # stacking path (tests/test_frame_ring.py). BENCH_CNN_LEGACY=1 runs the
    # stacking baseline; BENCH_CNN_NODEDUP=1 keeps the 2-frame/row ring;
    # PEARL_TPU_RING_WRITE=0 / PEARL_TPU_PUSH_FENCE=0 disable the kernels
    # (each default chosen by on-chip A/B — PARITY.md round-5 ladder).
    if not skip_extras and _budget_left(budget):
        import jax.numpy as jnp

        from pearl_tpu.envs import SyntheticAtari
        from pearl_tpu.history_summarization_modules import (
            FrameRingHistorySummarization,
            StackingHistorySummarization,
        )
        from pearl_tpu.neural_networks.q_value_networks import CNNQValueNetwork
        from pearl_tpu.replay_buffers.visual import VisualReplayBuffer

        cnn_envs = int(os.environ.get("BENCH_CNN_NUM_ENVS", 1024))
        legacy = os.environ.get("BENCH_CNN_LEGACY") == "1"
        dedup = os.environ.get("BENCH_CNN_NODEDUP") != "1" and not legacy
        summ = (
            StackingHistorySummarization(history_length=4, include_action=False)
            if legacy
            else FrameRingHistorySummarization(
                history_length=4, dtype=jnp.bfloat16
            )
        )
        cnn_agent = PearlAgent(
            policy_learner=DeepQLearning(
                # Reference Atari conv stack (q_value_networks.py:714-926):
                # conv 8x8x4->16 s4, 4x4x16->32 s2, fc->128 heads.
                q_network=CNNQValueNetwork(
                    input_shape=(84, 84, 4), time_major_stack=True
                ),
                training_rounds=1,
                batch_size=512,
                act_dtype="bfloat16",
                history_summarizer=summ,
            ),
            replay_buffer=VisualReplayBuffer(
                capacity=8 * cnn_envs, stack=4, num_envs=cnn_envs,
                frame_dtype=jnp.bfloat16, dedup_next=dedup,
            ),
        )
        sps_cnn, smp_cnn = _measure_fused(
            cnn_agent,
            SyntheticAtari(frames=1, obs_dtype=None if legacy else jnp.bfloat16),
            num_envs=cnn_envs,
            steps_per_learn=8, learns_per_call=8, calls=5, label="cnn84",
            budget=budget,
        )
        _emit("cnn_dqn_atari84_env_steps_per_s", sps_cnn, smp_cnn)
        # MFU estimate: ~5.3 MFLOP/frame forward (conv1 3.3M + conv2 1.3M +
        # fc 0.7M), act 1 fwd/env-step + learn ~4 fwd-equiv x 512 per 8 x
        # cnn_envs steps.
        flops_per_step = 5.3e6 * (1.0 + 4.0 * 512 / (8 * cnn_envs))
        _note(
            f"cnn84 MFU ~= {sps_cnn * flops_per_step / 197e12 * 100:.1f}% "
            f"of v5e 197 TF/s bf16 peak ({sps_cnn * flops_per_step / 1e12:.1f} TF/s)"
        )
    else:
        _note("cnn84 skipped (budget/flag)")

    # ---- 3. Continuous SAC on Pendulum -------------------------------------
    if not skip_extras and _budget_left(budget):
        from pearl_tpu.envs import Pendulum
        from pearl_tpu.policy_learners.sequential_decision_making import (
            ContinuousSoftActorCritic,
        )

        # 131072 envs (round 5): CSAC scales with env count just like DQN —
        # 166-252M @16k (with a reproducible fast/slow bimodality), 442M
        # @32k, 582M @65k, 676M @131k steps/s on one v5e. Ring capacity
        # keeps ~16 pushes resident like the 16k config did.
        csac_envs = int(os.environ.get("BENCH_CSAC_NUM_ENVS", 131_072))
        csac = PearlAgent(
            policy_learner=ContinuousSoftActorCritic(
                training_rounds=1, batch_size=1024
            ),
            replay_buffer=BasicReplayBuffer(capacity=16 * csac_envs),
        )
        # Multi-call windows (round-2 protocol: dispatch latency dominates
        # 0.1s windows), repeated until stderr < 5% — round 4's single
        # 0.42s window hid a 1.5x between-run spread on this metric.
        sps_csac, smp_csac = _measure_fused(
            csac, Pendulum(), num_envs=csac_envs, steps_per_learn=8,
            learns_per_call=16, calls=50, label="csac", budget=budget,
        )
        _emit("csac_pendulum_env_steps_per_s", sps_csac, smp_csac)
    else:
        _note("csac skipped (budget/flag)")

    # ---- 3b. On-policy family: fused PPO on CartPole -----------------------
    if not skip_extras and _budget_left(budget):
        from pearl_tpu.policy_learners.sequential_decision_making import (
            ProximalPolicyOptimization,
        )
        from pearl_tpu.replay_buffers.on_policy import OnPolicyReplayBuffer

        # 131072 envs (round 5): PPO is GAE/actor-update-bound, so env
        # scaling is modest — 65.2M @16k -> 71.4M @131k steps/s — but real.
        ppo_envs = int(os.environ.get("BENCH_PPO_NUM_ENVS", 131_072))
        rollout = 8
        ppo = PearlAgent(
            policy_learner=ProximalPolicyOptimization(
                training_rounds=1, batch_size=1024
            ),
            replay_buffer=OnPolicyReplayBuffer(
                capacity=rollout * ppo_envs, num_envs=ppo_envs
            ),
        )
        sps_ppo, smp_ppo = _measure_fused(
            ppo, CartPole(), num_envs=ppo_envs, steps_per_learn=rollout,
            learns_per_call=16, calls=10, label="ppo", budget=budget,
        )
        _emit("ppo_cartpole_env_steps_per_s", sps_ppo, smp_ppo)
    else:
        _note("ppo skipped (budget/flag)")

    # ---- 3c. Driver with REAL per-episode curves (stats="curves") ----------
    # Self-consistent config (round-4 verdict item 4): curve_capacity covers
    # the per-device env count, so no episode can be dropped to ring
    # collisions and the bench never fires its own collision warning; the
    # measured drop count is emitted with the metric. The ring is (R, 3)
    # floats — R = num_envs costs 1.5 MB of device memory and one host drain
    # per dispatch. BENCH_CURVE_CAPACITY overrides (smaller R = sampled
    # curves; episodes_dropped then reports the loss honestly).
    if not skip_extras and _budget_left(budget):
        from pearl_tpu.training.online import online_learning as _ol

        curve_cap = int(os.environ.get("BENCH_CURVE_CAPACITY", num_envs))
        spd_c = num_envs * steps_per_learn * learns_per_call
        _ol(
            agent, CartPole(), num_envs=num_envs, max_steps=spd_c * 2,
            learn_every_k_steps=steps_per_learn,
            chunks_per_dispatch=learns_per_call, seed=0, target_return=1e9,
            stats="curves", curve_capacity=curve_cap,
        )
        curve_state = {"dropped": 0, "episodes": 0, "drained": 0}

        def run_curve_group(g):
            res_c = _ol(
                agent, CartPole(), num_envs=num_envs, max_steps=spd_c * 5,
                learn_every_k_steps=steps_per_learn,
                chunks_per_dispatch=learns_per_call, seed=1 + g,
                target_return=1e9, stats="curves", curve_capacity=curve_cap,
            )
            curve_state["dropped"] += int(res_c.episodes_dropped)
            curve_state["episodes"] += int(res_c.total_episodes)
            curve_state["drained"] += len(res_c.episode_returns)

        sps_curves, smp_curves = _sample_until_stable(
            run_curve_group, spd_c * 5, "curves", budget
        )
        _note(
            f"curves driver: R={curve_cap}, {curve_state['episodes']} episodes, "
            f"{curve_state['drained']} drained, {curve_state['dropped']} dropped"
        )
        _emit(
            "online_learning_curves_env_steps_per_s", sps_curves, smp_curves,
            episodes_dropped=curve_state["dropped"],
            episodes_total=curve_state["episodes"],
            curve_capacity=curve_cap,
        )

        # Lossless-curves companion line: at 100M+ steps/s the device
        # finishes millions of episodes per host drain, so the flagship
        # config above is necessarily a SAMPLED stream (drops are counted
        # in its JSON line). This config sizes the dispatch so every
        # finished episode fits the ring (episodes/dispatch < R for ~10-step
        # episodes) — the price of zero drops is dispatch-rate-bound
        # throughput, measured honestly here.
        ll_cpd = int(os.environ.get("BENCH_CURVE_LOSSLESS_CPD", 1))
        spd_ll = num_envs * steps_per_learn * ll_cpd
        _ol(
            agent, CartPole(), num_envs=num_envs, max_steps=spd_ll * 4,
            learn_every_k_steps=steps_per_learn, chunks_per_dispatch=ll_cpd,
            seed=0, target_return=1e9, stats="curves", curve_capacity=curve_cap,
        )
        ll_state = {"dropped": 0, "episodes": 0}

        def run_ll_group(g):
            res_l = _ol(
                agent, CartPole(), num_envs=num_envs, max_steps=spd_ll * 20,
                learn_every_k_steps=steps_per_learn,
                chunks_per_dispatch=ll_cpd, seed=101 + g, target_return=1e9,
                stats="curves", curve_capacity=curve_cap,
            )
            ll_state["dropped"] += int(res_l.episodes_dropped)
            ll_state["episodes"] += int(res_l.total_episodes)

        sps_ll, smp_ll = _sample_until_stable(
            run_ll_group, spd_ll * 20, "curves_lossless", budget
        )
        _emit(
            "online_learning_curves_lossless_env_steps_per_s", sps_ll, smp_ll,
            episodes_dropped=ll_state["dropped"],
            episodes_total=ll_state["episodes"],
            curve_capacity=curve_cap,
        )
    else:
        _note("curves driver skipped (budget/flag)")

    # ---- 4. USER-FACING driver (printed last -> recorded "parsed") ---------
    # online_learning end-to-end with early stopping active (stats="summary",
    # unreachable target so the full budget runs). Same workload as #1.
    from pearl_tpu.training.online import online_learning

    env = CartPole()
    spd = num_envs * steps_per_learn * learns_per_call  # steps per dispatch
    t_warm = time.perf_counter()
    online_learning(
        agent, env, num_envs=num_envs, max_steps=spd * 2,
        learn_every_k_steps=steps_per_learn, chunks_per_dispatch=learns_per_call,
        seed=0, target_return=1e9, target_window=20, stats="summary",
    )
    _note(f"online_learning warmup {time.perf_counter()-t_warm:.1f}s")
    # 30 dispatches per timed group: each group is a fresh online_learning
    # call, and per-call setup/drain amortizes over the group (10-dispatch
    # groups measured ~7% low vs the round-4 40-dispatch window).
    online_calls = int(os.environ.get("BENCH_ONLINE_CALLS", 30))

    def run_driver_group(g):
        res = online_learning(
            agent, env, num_envs=num_envs, max_steps=spd * online_calls,
            learn_every_k_steps=steps_per_learn,
            chunks_per_dispatch=learns_per_call, seed=1 + g,
            target_return=1e9, target_window=20, stats="summary",
        )
        run_driver_group.last = res

    online_sps, smp_online = _sample_until_stable(
        run_driver_group, spd * online_calls, "driver", budget
    )
    res = run_driver_group.last
    _note(
        f"online_learning driver: {res.total_steps} steps/group, "
        f"{res.total_episodes} episodes, early-stop active"
    )
    _emit("online_learning_driver_env_steps_per_s", online_sps, smp_online)


if __name__ == "__main__":
    main()
