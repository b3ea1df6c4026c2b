"""Every example script must stay importable against the current API
(reference parity: the tutorials are executed by test/unit/test_tutorials).

Importing executes the module body (imports + agent/config construction
helpers) without running `main()`, so API drift in any example fails CI
cheaply; the convergence-level behavior of the same code paths is covered by
tests/integration/. dqn_cartpole's `main()` additionally has its own smoke
run here at a tiny budget."""

import importlib.util
import pathlib

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_imports(path):
    spec = importlib.util.spec_from_file_location(f"example_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert hasattr(mod, "main") or path.stem == "dp_scaling", path.stem


def test_quickstart_example_smoke(monkeypatch):
    """The README quick-start (examples/dqn_cartpole.py) runs end-to-end at a
    reduced budget: online_learning with the example's exact agent config."""
    path = next(p for p in EXAMPLES if p.stem == "dqn_cartpole")
    spec = importlib.util.spec_from_file_location("example_dqn_cartpole", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import pearl_tpu.training as training

    orig = training.online_learning

    def tiny(agent, env, **kw):
        kw.update(max_steps=2_048, num_envs=8, learning_starts=256)
        kw.setdefault("learn_every_k_steps", 8)
        return orig(agent, env, **kw)

    monkeypatch.setattr(mod, "online_learning", tiny, raising=False)
    mod.main()
