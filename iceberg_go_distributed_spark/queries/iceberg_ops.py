"""Iceberg table-layer queries (scan/filter/project/limit, time travel,
partition-transform pruning, deletes) registered against the engine's own
table format. Populated as the table layer lands.
"""

from __future__ import annotations
