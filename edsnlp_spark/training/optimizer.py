"""Training optimizer wrapper: regex param-group selection + schedules.

Parity target: edsnlp/training/optimizer.py:144-476 (ScheduledOptimizer)
and :78-161 (LinearSchedule).  The reference wraps torch optimizers;
torch is absent in this container, so the backend optimizer is
INJECTABLE — anything exposing ``param_groups`` / ``step()`` /
``zero_grad()`` (``BaseOptimizer`` is the no-op reference backend used
by the training smoke loop; a real torch optimizer class drops in
unchanged because only the group-list construction is done here).

Reference semantics kept exactly:

* groups are an ORDERED mapping selector-regex -> settings (or a list of
  ``{"selector": ..., ...}`` dicts; ``exclude=True`` maps to ``False``);
* each parameter maps to the tuple of selectors whose
  ``re.search(sel, name)`` matches, in group order;
* per clique (distinct selector tuple) the settings are combined in
  REVERSE order so earlier selectors overwrite later ones ("the first
  group settings take precedence", optimizer.py:196-199);
* a clique that matched ANY excluded selector is dropped
  (optimizer.py:313-315 break), and a clique without an ``lr`` setting
  is dropped (optimizer.py:320);
* final group order is reversed (optimizer.py:327);
* schedule values (LinearSchedule) may appear in place of any setting;
  they are discovered by walking ``param_groups`` (extract_schedules)
  and stepped together with the optimizer, writing their current value
  through their ``paths`` into the group structure.
"""

from __future__ import annotations

import re
import warnings
from collections import defaultdict
from typing import Any, Callable


def get_deep(node, path):
    for p in path:
        node = node[p]
    return node


def set_deep(node, path, value):
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def split_path(path):
    """'0.lr' -> (0, 'lr') (confit split_path analog: int-like segments
    become list indices)."""
    if isinstance(path, (list, tuple)):
        return tuple(path)
    return tuple(int(p) if p.lstrip("-").isdigit() else p
                 for p in str(path).split("."))


class Schedule:
    def __init__(self, path, start_value):
        self.paths = None if path is None else [split_path(path)]
        self.start_value = start_value

    def step(self, groups):
        raise NotImplementedError

    def reset(self, groups):
        raise NotImplementedError


class LinearSchedule(Schedule):
    """Warmup then linear decay (optimizer.py:78-161): value rises
    linearly from ``start_value`` to ``max_value`` over the first
    ``warmup_rate * total_steps`` steps, then decays linearly to
    ``end_value`` by ``total_steps``."""

    def __init__(self, total_steps: int | None = None,
                 max_value: float | None = None, start_value: float = 0.0,
                 path=None, warmup_rate: float = 0.0,
                 end_value: float = 0.0):
        super().__init__(path, start_value)
        self.max_value = max_value
        self.warmup_rate = warmup_rate
        self.total_steps = total_steps
        self.end_value = end_value
        self.idx = 0

    def reset(self, groups):
        self.idx = -1
        self.step(groups)

    def state_dict(self):
        return {"idx": self.idx}

    def load_state_dict(self, state):
        self.idx = state["idx"]

    def step(self, groups):
        self.idx += 1
        if self.max_value is None:
            # late-binding max: take the current value at the first path
            # (optimizer.py:130-138)
            value = get_deep(groups, self.paths[0])
            if not isinstance(value, (int, float)):
                raise ValueError(
                    "the max_value parameter of the linear schedule "
                    "must be set to a valid number")
            self.max_value = value
        warmup_steps = self.total_steps * self.warmup_rate
        if self.idx < warmup_steps:
            progress = self.idx / warmup_steps
            value = (self.start_value
                     + (self.max_value - self.start_value) * progress)
        else:
            progress = min(
                1.0,
                (self.idx - warmup_steps) / (self.total_steps - warmup_steps))
            value = (self.max_value
                     + (self.end_value - self.max_value) * progress)
        for path in self.paths:
            set_deep(groups, path, value)

    def __repr__(self):
        return (f"LinearSchedule(start={self.start_value}, "
                f"max={self.max_value}, end={self.end_value}, "
                f"warmup_rate={self.warmup_rate}, "
                f"total_steps={self.total_steps})")


class BaseOptimizer:
    """Minimal optimizer backend: holds param_groups, delegates the
    actual update to an injectable ``apply(group, param)`` (identity by
    default — the container has no autograd; the training smoke loop
    injects its own update)."""

    def __init__(self, param_groups: list[dict],
                 apply: Callable[[dict, Any], None] | None = None):
        self.param_groups = list(param_groups)
        self._apply = apply
        self.steps = 0

    def step(self, closure=None):
        self.steps += 1
        if self._apply is not None:
            for group in self.param_groups:
                for param in group.get("params", []):
                    self._apply(group, param)

    def zero_grad(self):
        pass

    def state_dict(self):
        # like torch optimizers, the state includes the param_groups'
        # hyperparameter values (minus the params and any live Schedule
        # objects), so load_state_dict restores e.g. the current lr
        return {"steps": self.steps, "param_groups": [
            {k: v for k, v in g.items()
             if k != "params" and not isinstance(v, Schedule)}
            for g in self.param_groups]}

    def load_state_dict(self, state):
        self.steps = state["steps"]
        for group, saved in zip(self.param_groups, state["param_groups"]):
            group.update(saved)


class ScheduledOptimizer:
    """Regex param-group selection + schedule stepping
    (optimizer.py:163-476, semantics in the module docstring)."""

    def __init__(self, optim, module=None, total_steps: int | None = None,
                 groups=None, init_schedules: bool = True, **kwargs):
        should_instantiate = isinstance(optim, type) or (
            module is not None and groups is not None and callable(optim))
        if should_instantiate and (groups is None or module is None):
            raise ValueError("if the optimizer is a type, the module and "
                             "groups must be provided")
        if not should_instantiate and (groups is not None
                                       or module is not None):
            raise ValueError("if the optimizer is already instantiated, "
                             "the module and groups must not be provided")

        if should_instantiate:
            named_parameters = list(module.named_parameters())
            if isinstance(groups, list):
                groups = [dict(g) for g in groups]
                groups = {g.pop("selector"):
                          (g if not g.get("exclude") else False)
                          for g in groups}
            groups = {sel: (dict(g) if g else False)
                      for sel, g in groups.items()}

            param_to_groups = {}
            for name, param in named_parameters:
                param_to_groups[id(param)] = (param, tuple(dict.fromkeys(
                    sel for sel in groups if re.search(sel, name))))
            groups_to_params = defaultdict(list)
            empty_selectors = set(groups)
            for param, sels in param_to_groups.values():
                groups_to_params[sels].append(param)
                empty_selectors.difference_update(sels)
            if empty_selectors:
                warnings.warn(f"selectors {sorted(empty_selectors)} did "
                              f"not match any parameters")

            cliques = []
            for selectors, params in groups_to_params.items():
                group: dict = {}
                for sel in reversed(selectors):
                    if groups[sel] is False:
                        break
                    group.update(groups[sel])
                else:
                    if group and "lr" in group and params:
                        group["selectors"] = list(selectors)
                        group["params"] = params
                        cliques.append(group)
            cliques = list(reversed(
                [{k: v for k, v in g.items() if v is not None}
                 for g in cliques]))
            optim = optim(cliques, **kwargs)

        self.optim = optim
        self.schedules = self.extract_schedules(optim.param_groups)
        for schedule in self.schedules:
            if schedule.total_steps is None:
                if total_steps is None:
                    raise ValueError("total_steps must be provided to the "
                                     "optimizer or the schedule")
                schedule.total_steps = total_steps
            if init_schedules:
                schedule.step(optim.param_groups)

    @classmethod
    def extract_schedules(cls, param_groups) -> list[Schedule]:
        """Walk param_groups for Schedule leaves; bind each schedule's
        write-back paths to where it was found (optimizer.py:345-390)."""
        schedules: dict[Schedule, set] = defaultdict(set)

        def rec(node, path):
            if len(path) == 2 and path[1] == "params":
                return
            if isinstance(node, dict):
                items = node.items()
            elif isinstance(node, (list, tuple)):
                items = enumerate(node)
            else:
                if isinstance(node, Schedule):
                    schedules[node].add(path)
                return
            for key, value in items:
                rec(value, (*path, key))

        rec(param_groups, ())
        for schedule, paths in schedules.items():
            paths = sorted(paths)
            if schedule.paths is None:
                schedule.paths = paths
            elif schedule.paths != paths:
                raise ValueError(
                    f"schedule path mismatch: {schedule.paths} != {paths}")
        return list(schedules)

    @property
    def param_groups(self):
        return self.optim.param_groups

    def zero_grad(self):
        return self.optim.zero_grad()

    def step(self, closure=None):
        # reference order (optimizer.py:420-423): optimizer first, THEN
        # advance the schedules for the next step
        self.optim.step(closure)
        self.step_schedules()

    def step_schedules(self):
        for schedule in self.schedules:
            schedule.step(self.optim.param_groups)

    def initialize(self):
        self.reset()
        return self.optim.step()

    def reset(self):
        self.optim.zero_grad()
        for schedule in self.schedules:
            schedule.reset(self.optim.param_groups)

    def state_dict(self):
        return {
            "optim": self.optim.state_dict(),
            "schedules": [s.state_dict() for s in self.schedules],
        }

    def load_state_dict(self, state):
        self.optim.load_state_dict(state["optim"])
        for s, st in zip(self.schedules, state["schedules"]):
            s.load_state_dict(st)
