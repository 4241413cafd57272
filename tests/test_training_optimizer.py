"""ScheduledOptimizer / LinearSchedule parity with the reference's own
test suite (tests/training/test_optimizer.py) — torch-free: parameters
are plain named objects and the backend is BaseOptimizer."""

from __future__ import annotations

import warnings

import pytest

from edsnlp_spark.training import (BaseOptimizer, LinearSchedule,
                                   ScheduledOptimizer)


class Param:
    def __init__(self, name):
        self.name = name

    def __repr__(self):
        return f"Param({self.name})"


class Net:
    """Two 'layers' like the reference Net (fc1: weight+bias, fc2:
    weight+bias)."""

    def __init__(self):
        self.params = {
            "fc1.weight": Param("fc1.weight"),
            "fc1.bias": Param("fc1.bias"),
            "fc2.weight": Param("fc2.weight"),
            "fc2.bias": Param("fc2.bias"),
        }

    def named_parameters(self):
        return list(self.params.items())


@pytest.mark.parametrize("groups_factory", [
    lambda: {
        "fc1[.].*": {"lr": LinearSchedule(start_value=0.0, max_value=0.1,
                                          warmup_rate=0.2),
                     "weight_decay": 0.01},
        "fc2[.]bias": False,
        "": {"lr": 0.0001, "weight_decay": 0.0},
    },
    lambda: [
        {"selector": "fc1[.].*",
         "lr": LinearSchedule(start_value=0.0, max_value=0.1,
                              warmup_rate=0.2),
         "weight_decay": 0.01},
        {"selector": "fc2[.]bias", "exclude": True},
        {"selector": "", "lr": 0.0001, "weight_decay": 0.0},
    ],
])
def test_parameter_selection_and_schedule(groups_factory):
    """Reference golden (test_optimizer.py:97-138): group order is
    reversed, fc2.bias excluded, and the fc1 lr follows the exact
    warmup/decay sequence for total_steps=10, warmup_rate=0.2."""
    net = Net()
    optim = ScheduledOptimizer(
        optim=BaseOptimizer, module=net, groups=groups_factory(),
        total_steps=10,
    )
    optim.initialize()

    fc2_group = optim.param_groups[0]
    assert fc2_group["lr"] == pytest.approx(0.0001)
    assert {p.name for p in fc2_group["params"]} == {"fc2.weight"}

    fc1_group = optim.param_groups[1]
    assert fc1_group["lr"] == pytest.approx(0.0)
    assert fc1_group["weight_decay"] == pytest.approx(0.01)
    assert {p.name for p in fc1_group["params"]} == {"fc1.weight",
                                                     "fc1.bias"}

    lr_values = [fc1_group["lr"]]
    for _ in range(10):
        optim.step()
        lr_values.append(fc1_group["lr"])
    assert lr_values == pytest.approx(
        [0.0, 0.05, 0.1, 0.0875, 0.075, 0.0625, 0.05, 0.0375, 0.025,
         0.0125, 0.0])


def test_serialization_roundtrip():
    """Reference test_serialization: snapshot at step 5, run to the
    end (lr 0.0), restore -> lr back to 0.0625."""
    net = Net()
    optim = ScheduledOptimizer(
        optim=BaseOptimizer, module=net, groups={
            "fc1[.].*": {"lr": LinearSchedule(start_value=0.0,
                                              max_value=0.1,
                                              warmup_rate=0.2),
                         "weight_decay": 0.01},
            "fc2[.]bias": False,
            "": {"lr": 0.0001, "weight_decay": 0.0},
        }, total_steps=10,
    )
    optim.initialize()
    state_dict = None
    for i in range(10):
        if i == 5:
            state_dict = optim.state_dict()
        optim.step()
    assert optim.param_groups[-1]["lr"] == pytest.approx(0.0)
    optim.load_state_dict(state_dict)
    assert optim.param_groups[-1]["lr"] == pytest.approx(0.0625)
    optim.reset()
    assert optim.param_groups[-1]["lr"] == pytest.approx(0.0)


def test_empty_selector_warns_and_late_binding_max():
    net = Net()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        optim = ScheduledOptimizer(
            optim=BaseOptimizer, module=net, groups={
                "does_not_exist": {"lr": 0.5},
                # schedule with NO max_value: binds to the current lr
                # (reference optimizer.py:130-138)
                "fc1[.].*": {"lr": 0.2,
                             "schedules_lr": LinearSchedule(
                                 start_value=0.0, warmup_rate=0.5,
                                 path=None)},
                "": {"lr": 0.0001},
            }, total_steps=4, init_schedules=False,
        )
    assert any("did not match any parameters" in str(x.message) for x in w)
    # the schedule found at key 'schedules_lr' writes back to its own
    # path; late-binding max reads the value there -> must be numeric,
    # so bind it explicitly to the group's lr path instead
    sched = optim.schedules[0]
    fc1_idx = next(i for i, g in enumerate(optim.param_groups)
                   if "schedules_lr" in g)
    sched.paths = [(fc1_idx, "lr")]
    sched.step(optim.param_groups)   # idx 0->1: half of 2 warmup steps,
    assert sched.max_value == pytest.approx(0.2)   # max bound from lr
    assert optim.param_groups[fc1_idx]["lr"] == pytest.approx(0.1)


def test_instantiated_optim_rejects_module_groups():
    with pytest.raises(ValueError):
        ScheduledOptimizer(optim=BaseOptimizer([{"lr": 0.1, "params": []}]),
                           module=Net(), groups={"": {"lr": 0.1}})
