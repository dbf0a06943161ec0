# Copyright 2026. Apache License 2.0.
"""Iteration-windowed profiler hook.

Parity target: reference medicalseg/utils/train_profiler.py:26-112 — a
``--profiler_options "batch_range=[50,60];profile_path=...;
exit_on_finished=true"`` option string starts/stops an op-level profiler
trace at the window edges of the training loop. The TPU backend is
``jax.profiler`` (traces are TensorBoard/XProf-compatible), replacing
paddle.utils.profiler.
"""

import sys

import jax

_profiler_options = None
_profiler_step_id = 0
_started = False


class ProfilerOptions:
    """Parses 'key=value;key=value' option strings.

    Supported keys (reference train_profiler.py:26-81):
        batch_range - e.g. [50, 60]
        profile_path - trace output directory
        exit_on_finished - whether to exit after the window
        state / sorted_key / tracer_option - accepted for CLI parity
          (ignored: jax.profiler always records full op-level traces).
    """

    def __init__(self, options_str):
        assert isinstance(options_str, str)
        self._options = {
            "batch_range": [10, 20],
            "state": "All",
            "sorted_key": "total",
            "tracer_option": "Default",
            "profile_path": "/tmp/profile",
            "exit_on_finished": True,
        }
        self._parse_from_string(options_str)

    def _parse_from_string(self, options_str):
        for kv in options_str.replace(" ", "").split(";"):
            if not kv:
                continue
            key, value = kv.split("=")
            if key == "batch_range":
                value_list = value.replace("[", "").replace("]", "").split(
                    ",")
                value_list = list(map(int, value_list))
                if len(value_list) >= 2 and 0 <= value_list[0] < \
                        value_list[1]:
                    self._options[key] = value_list
            elif key == "exit_on_finished":
                self._options[key] = value.lower() in ("yes", "true", "t",
                                                       "1")
            elif key in ("state", "sorted_key", "tracer_option",
                         "profile_path"):
                self._options[key] = value

    def __getitem__(self, name):
        if name not in self._options:
            raise ValueError(
                "ProfilerOptions does not have an option named %s." % name)
        return self._options[name]


def add_profiler_step(options_str=None):
    """Call once per training iteration (reference core/train.py:153)."""
    if options_str is None:
        return

    global _profiler_options, _profiler_step_id, _started
    if _profiler_options is None:
        _profiler_options = ProfilerOptions(options_str)

    lo, hi = _profiler_options["batch_range"]
    if _profiler_step_id == lo and not _started:
        jax.profiler.start_trace(_profiler_options["profile_path"])
        _started = True
    elif _profiler_step_id == hi and _started:
        jax.profiler.stop_trace()
        _started = False
        if _profiler_options["exit_on_finished"]:
            sys.exit(0)

    _profiler_step_id += 1
