"""Driver-side job orchestration — the Statement/StatementSet analog.

The reference wraps every SQL string in a ``Statement`` (message,
captured error, elapsed-time logging) and runs independent statements
through a pool of up to 25 worker *processes*, ordered lists serially and
optionally transactionally (reference: pedsnetdcc/db.py:14-497;
structured elapsed-time logging in dict_logging.py:78-249).

In Spark, executors provide the data-plane parallelism, but independent
*actions* (e.g. one materialization per table in the transform or merge
pipelines) still benefit from concurrent submission so the scheduler can
interleave their stages.  ``run_parallel`` submits jobs from a thread
pool (threads, not processes — actions are IO-bound on the driver);
``run_serial`` mirrors ``StatementList.serial_execute`` including its
stop-on-error behavior.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

logger = logging.getLogger(__name__)


@dataclass
class Job:
    """A named driver action with captured result/error and elapsed time
    (the ``Statement`` analog, db.py:14-246)."""

    name: str
    fn: Callable[[], object]
    result: object = None
    error: BaseException | None = None
    elapsed: float = field(default=0.0)

    def run(self) -> "Job":
        t0 = time.monotonic()
        try:
            self.result = self.fn()
        except BaseException as exc:  # captured, not raised — db.py behavior
            self.error = exc
        self.elapsed = time.monotonic() - t0
        logger.info(
            "job finished",
            extra={"job": self.name, "elapsed": round(self.elapsed, 3), "ok": self.error is None},
        )
        return self


def run_parallel(jobs: Sequence[Job], pool_size: int = 25) -> list[Job]:
    """Unordered concurrent execution (``StatementSet.parallel_execute``,
    db.py:285-369; default pool of 25, db.py:314-320)."""
    with ThreadPoolExecutor(max_workers=min(pool_size, max(len(jobs), 1))) as ex:
        return list(ex.map(Job.run, jobs))


def check_jobs(
    jobs: Sequence[Job],
    force: bool = False,
    benign: tuple[type[BaseException], ...] = (FileExistsError, FileNotFoundError),
) -> None:
    """Raise the first captured error — unless ``force`` and the error
    is benign (the reference's force mode ignores DUPLICATE_TABLE /
    UNDEFINED_OBJECT-class errors so idempotent re-runs succeed:
    indexes.py:89-124, merge_site_data.py:43-78, utils.py:391-406)."""
    for j in jobs:
        if j.error is None:
            continue
        if force and isinstance(j.error, benign):
            logger.info("ignoring benign error", extra={"job": j.name, "err": repr(j.error)})
            continue
        raise j.error


def run_serial(jobs: Sequence[Job], stop_on_error: bool = True) -> list[Job]:
    """Ordered execution (``StatementList.serial_execute``, db.py:372-456)."""
    done: list[Job] = []
    for j in jobs:
        done.append(j.run())
        if stop_on_error and j.error is not None:
            break
    return done
