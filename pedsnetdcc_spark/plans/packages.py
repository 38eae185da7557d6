"""Pluggable external-package runner — the R/Argos hook (X4).

The reference shells out to R packages (generic query packages, COVID/
RECOVER derivations, dose calc, PCORnet slices) via ``Rscript`` with a
generated Argos JSON config; the Python side only prepares config, runs
the tool, and post-processes with the relational ops this engine
already provides (reference: pedsnetdcc/r_query.py:62-128,
r_obs_covid.py:226+, r_dose.py:88-194; SURVEY.md §2.11 X4: "expose the
post-processing ops + a pluggable package runner hook").

Here the hook is a registry of ``PackageRunner`` callables taking
``(spark, config) -> DataFrame``: a deployment registers an
implementation that materializes inputs, invokes the external tool
(subprocess, REST, whatever), and returns the result table; pipelines
compose it with the engine's post-processing operators.  A built-in
``dataframe_package`` wraps a pure-Spark callable so pipelines can be
tested end-to-end without external tools.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

PackageRunner = Callable[[SparkSession, dict[str, Any]], DataFrame]

_REGISTRY: dict[str, PackageRunner] = {}


def register_package(name: str, runner: PackageRunner) -> None:
    _REGISTRY[name] = runner


def run_package(spark: SparkSession, name: str, config: dict[str, Any]) -> DataFrame:
    """Run a registered package (the ``run_r_query`` analog: config in,
    derived table out)."""
    if name not in _REGISTRY:
        raise KeyError(
            f"no package runner registered for {name!r}; "
            f"known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](spark, config)


def dataframe_package(fn: Callable[..., DataFrame]) -> PackageRunner:
    """Wrap a pure-Spark callable as a package runner (config keys are
    passed as kwargs) — used for tests and for derivations that have
    been natively reimplemented (e.g. BMI/z-score, operators/anthro.py,
    which replace the reference's external Perl tools)."""

    def runner(spark: SparkSession, config: dict[str, Any]) -> DataFrame:
        return fn(spark=spark, **config)

    return runner
