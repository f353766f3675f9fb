"""Full convergence gates — deselected by default (pyproject addopts
``-m 'not slow and not tpu'``).  Run explicitly with::

    python -m pytest tests/test_convergence_slow.py -m slow --no-header -q

or reproduce the same matrix standalone via scripts/convergence_gates.py.
On CPU each gate takes tens of minutes; on TPU ~2-3 minutes.
"""

import pytest

pytestmark = pytest.mark.slow


def _run(gate):
    import sys

    sys.path.insert(0, ".")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "convergence_gates", "scripts/convergence_gates.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # registry lives inside main(); rebuild the one gate directly
    from deepfbsdejsolvers_tpu.models.merton import make_merton_default
    from deepfbsdejsolvers_tpu.ops.compensator import CompensatorSpec

    merton_oracle = make_merton_default().price_at_origin()
    cheb64 = CompensatorSpec(x_interp="chebyshev", n_cheb=64)
    if gate == "merton_speed":
        return mod.run_gate(
            "merton_speed",
            make_merton_default(jump_sampler="icdf", price_mode="chebyshev"),
            merton_oracle, "multistep1", compensator=cheb64)
    raise ValueError(gate)


def test_merton_speed_gate():
    record = _run("merton_speed")
    assert record["abs_error"] <= 1e-3
