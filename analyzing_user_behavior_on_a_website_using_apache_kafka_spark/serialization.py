"""Executor-side function shipping.

Module-level Python functions passed to ``mapInPandas`` /
``applyInPandasWithState`` are cloudpickled BY REFERENCE (module +
qualname), which breaks when the executor workers don't have this
package on their import path — exactly the situation when the driver
harness runs from an arbitrary cwd with ``sys.path`` pointing at the
repo only in the driver process. Registering the defining module for
by-value pickling makes the function bytes travel with the task instead.

(Closures and lambdas are always pickled by value; only named
module-level functions need this.)
"""

from __future__ import annotations

import sys

_registered: set[str] = set()


def pickle_module_by_value(module_name: str) -> None:
    """Idempotently register a module for cloudpickle by-value transport."""
    if module_name in _registered:
        return
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[module_name])
    _registered.add(module_name)
