"""Experiment harness: runner, sweeps, plots.

The TPU-native analogue of the reference's experiment layer
(``runAlgo`` in ``main.cpp:142-255`` + the ``experiments.py`` REPL
workflows + ``plot.py``), writing artifacts in the reference's formats so
parity checks are plain diffs.
"""

from .runner import run_experiment

__all__ = ["run_experiment"]
