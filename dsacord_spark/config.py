"""Run configuration mirroring the reference CLI (/root/reference/main.go:43-57).

Same flag names and env-var fallbacks; plus engine-side knobs the Spark
implementation adds (landing dir, checkpoint dir, sink strategy).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import date, timedelta

# First day DSA dumps exist for Discord (main.go:102-105 warns below this).
EARLIEST_DUMP_DATE = date(2024, 8, 21)

# URL template, main.go:148.
URL_TEMPLATE = (
    "https://dsa-sor-data-dumps.s3.eu-central-1.amazonaws.com/"
    "sor-discord-netherlands-bv-%s-full.zip"
)

# Duplicate-handling strategies (main.go:55-56,90-91; utils.go:99):
#   error            — plain append, duplicate key -> error      (default)
#   upsert-on-conflict — optimistic append, retry whole unit as upsert on
#                        unique violation (main.go:194-204)
#   always-upsert    — ON CONFLICT (uuid) DO UPDATE every batch
#                      (--skipCheckingDuplicates, utils.go:99-104)
DUP_STRATEGIES = ("error", "upsert-on-conflict", "always-upsert")


@dataclass
class Config:
    date_from: date = EARLIEST_DUMP_DATE
    date_to: date = EARLIEST_DUMP_DATE
    workers: int = 1                      # main.go:54 (max 5 recommended)
    dup_strategy: str = "error"
    # DB (main.go:47-51; env-var names match the reference exactly)
    db_host: str = field(default_factory=lambda: os.environ.get("DB_HOST", "localhost"))
    db_port: int = field(default_factory=lambda: int(os.environ.get("DB_PORT", "5432")))
    db_user: str = field(default_factory=lambda: os.environ.get("DB_USER", "postgres"))
    db_password: str = field(default_factory=lambda: os.environ.get("DB_PASSWORD", ""))
    db_name: str = field(default_factory=lambda: os.environ.get("DB_NAME", "dsacord"))
    # Spark-engine additions
    landing_dir: str = "/tmp/dsacord/landing"
    checkpoint_dir: str = "/tmp/dsacord/checkpoints"
    jdbc_batch_size: int = 1000           # utils.go:89 ("do not increase this too much")
    sink_num_partitions: int = 5          # protect the DB like the ≤5 workers advice
    # 'driver': ThreadPoolExecutor(workers) on the driver — the
    # reference's worker pool (main.go:114-135), right for local mode
    # and small ranges. 'distributed': one Spark task per URL-table
    # partition downloads straight into the (DFS-visible) landing dir —
    # a multi-year backfill on a real cluster is NIC-bound on one node
    # otherwise (r8 verdict ask #3). Requires landing_dir visible to
    # executors (DFS, or local paths in local mode).
    staging: str = "driver"
    # Optional bucketed uuid-index table for the parquet lake sink's
    # duplicate probe (r10): bounds the daily anti-join to
    # index + batch-day reads instead of a full-lake uuid scan that
    # grows with lake age (sinks/parquet.append_new_decisions). None
    # keeps the historical full-probe behavior.
    uuid_index_table: str | None = None

    def validate(self) -> list[str]:
        """Date validation per main.go:69-79,102-112: error on inverted
        range; warnings (not errors) outside the known-data window."""
        if self.date_to < self.date_from:
            raise ValueError("'to' date must not be before 'from' date")
        if self.dup_strategy not in DUP_STRATEGIES:
            raise ValueError(f"dup_strategy must be one of {DUP_STRATEGIES}")
        if self.staging not in ("driver", "distributed"):
            raise ValueError("staging must be 'driver' or 'distributed'")
        warnings = []
        if self.date_from < EARLIEST_DUMP_DATE:
            warnings.append(f"data before {EARLIEST_DUMP_DATE} does not exist")
        if self.date_to >= date.today():
            warnings.append("fresh data may be delayed; today's dump may 403")
        return warnings

    def days(self) -> list[date]:
        """Inclusive day range, one unit of work per day (main.go:146-154)."""
        n = (self.date_to - self.date_from).days + 1
        return [self.date_from + timedelta(days=i) for i in range(n)]

    @property
    def jdbc_url(self) -> str:
        return f"jdbc:postgresql://{self.db_host}:{self.db_port}/{self.db_name}"
