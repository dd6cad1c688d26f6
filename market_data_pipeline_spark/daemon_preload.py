"""Custom PySpark worker-daemon module that preloads the heavy Python
stack before forking workers.

Python workers are forked from ``pyspark.daemon``; the daemon itself only
imports pyspark, so every forked worker pays the numpy + pandas + pyarrow
import chain (~1-2 s each) the first time a UDF referencing them is
unpickled. A pipeline with N chained Arrow-python stages on a C-core
executor needs N*C concurrent workers, so cold-start costs N*C imports —
tens of seconds of pure import time on a 32-core node before the first
Arrow batch moves.

Importing the stack HERE, in the daemon process before any fork, makes
every worker inherit the already-initialized modules copy-on-write for
free. Enabled via ``spark.python.daemon.module`` (see ``session.py``);
semantics are otherwise identical to the stock daemon — this module defers
to ``pyspark.daemon.manager`` for everything.
"""

# The imports below are the entire point of this module.
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

# pyspark.daemon resolves the worker entry point at import time (reading
# sys.argv for an alternate worker module), so importing it after the
# preload keeps stock behavior.
from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
