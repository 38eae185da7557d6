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


def registered_packages() -> list[str]:
    return sorted(_REGISTRY)


def run_package(spark: SparkSession, name: str, config: dict[str, Any]) -> DataFrame:
    """Run a registered package (the ``run_r_query`` analog: config in,
    derived table out)."""
    if name not in _REGISTRY:
        raise KeyError(
            f"no package runner registered for {name!r}; "
            f"known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](spark, config)


def load_package_config(path: str) -> dict[str, Any]:
    """Parse a reference-shaped package config file (JSON).

    The reference drives its R query packages from a generated Argos
    JSON config (source connection + schema search path) plus
    ``<SITE>``/``<SCHEMA>`` placeholder templating of the package's
    site files (reference: r_query.py:17-60 ``_create_argos_file`` /
    ``_fix_site_info`` / ``_fix_run``; main.py exposes the same knobs
    as ``run_r_query`` options).  The lake equivalent keeps the same
    shape with namespaces in place of connections::

        {
          "package": "dose_derivation",      # registry name (required)
          "site": "site_a",                  # <SITE> substitution
          "src": {"namespace": "/data/site_a"},   # argos src_args analog
          "output": "/data/site_a_derived",  # copy target ('/output')
          "copy": true,                      # copy results to output
          "model_version": "2.3.0",
          "options": {...}                   # extra runner kwargs
        }

    ``<SITE>`` and ``<SCHEMA>`` placeholders in any string value are
    substituted with ``site`` and ``src.namespace`` respectively —
    the same templating the reference applies to ``site_info.R``.
    """
    import json

    with open(path) as f:
        cfg = json.load(f)
    if "package" not in cfg:
        raise ValueError(f"package config {path!r} missing required key 'package'")
    site = cfg.get("site", "")
    schema = (cfg.get("src") or {}).get("namespace", "")

    def subst(v: Any) -> Any:
        if isinstance(v, str):
            return v.replace("<SITE>", site).replace("<SCHEMA>", schema)
        if isinstance(v, dict):
            return {k: subst(x) for k, x in v.items()}
        if isinstance(v, list):
            return [subst(x) for x in v]
        return v

    return subst(cfg)


def run_package_from_config(
    spark: SparkSession, config: dict[str, Any] | str
) -> DataFrame:
    """Config-file front end to :func:`run_package` — the
    ``run_r_query`` command path (reference r_query.py:62-128): load
    the config, dispatch the named package with the source namespace,
    site, model version and options, and (``copy: true``) publish the
    result table to the output namespace, mirroring the reference's
    results-to-``/output`` copy step."""
    cfg = load_package_config(config) if isinstance(config, str) else config
    runner_cfg: dict[str, Any] = dict(cfg.get("options") or {})
    for key in ("site", "model_version"):
        if key in cfg:
            runner_cfg.setdefault(key, cfg[key])
    ns = (cfg.get("src") or {}).get("namespace")
    if ns is not None:
        runner_cfg.setdefault("namespace", ns)
    result = run_package(spark, cfg["package"], runner_cfg)
    if cfg.get("copy") and cfg.get("output"):
        from pedsnetdcc_spark.sources.io import TableStore

        # single-table swap, NOT the generation-level publish: two
        # packages sharing an output namespace must not wipe each
        # other's published result tables
        store = TableStore(cfg["output"])
        store.replace(cfg.get("result_table", cfg["package"]), result)
    return result


def dataframe_package(fn: Callable[..., DataFrame]) -> PackageRunner:
    """Wrap a pure-Spark callable as a package runner (config keys are
    passed as kwargs) — used for tests and for derivations that have
    been natively reimplemented (e.g. BMI/z-score, operators/anthro.py,
    which replace the reference's external Perl tools)."""

    def runner(spark: SparkSession, config: dict[str, Any]) -> DataFrame:
        return fn(spark=spark, **config)

    return runner
