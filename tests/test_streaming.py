"""M5 — Structured Streaming: landing dir -> typed transform -> epoch
sink via foreachBatch with availableNow (the reference's one-shot
backfill), checkpointed resume, and epoch-level dedup."""

from __future__ import annotations

from dsacord_spark.schema import CSV_COLUMNS
from dsacord_spark.streaming.pipeline import start_decisions_stream

HEADER = ",".join(CSV_COLUMNS)


def _wire_csv(rows: list[dict]) -> str:
    return HEADER + "\n" + "\n".join(
        ",".join('"' + r.get(c, "") + '"' for c in CSV_COLUMNS) for r in rows
    )


def _write_day(landing, dt: str, name: str, rows: list[dict]) -> None:
    day = landing / f"dt={dt}"
    day.mkdir(parents=True, exist_ok=True)
    (day / name).write_text(_wire_csv(rows))


def test_streaming_backfill_dedup_and_resume(spark, tmp_path):
    landing = tmp_path / "landing"
    ckpt = str(tmp_path / "ckpt")
    _write_day(
        landing,
        "2025-01-01",
        "d1.csv",
        [
            {"uuid": "u1", "created_at": "2025-01-01 00:00:00", "account_type": "old"},
            {"uuid": "u1", "created_at": "2025-01-01 12:00:00", "account_type": "new"},
            {"uuid": "", "created_at": "2025-01-01 00:00:00"},  # quarantined
            {"uuid": "u2", "created_at": "2025-01-01 00:00:00"},
        ],
    )

    epochs: list[list] = []

    def sink(batch_df, epoch_id):
        epochs.append(batch_df.select("uuid", "account_type", "created_at").collect())

    q = start_decisions_stream(
        spark, str(landing), ckpt, sink, available_now=True
    )
    q.awaitTermination(120)
    batch1 = {r["uuid"]: r for e in epochs for r in e}
    assert set(batch1) == {"u1", "u2"}           # empty uuid quarantined
    assert batch1["u1"]["account_type"] == "new"  # epoch keep-latest dedup

    # late re-dump arrives: restart from checkpoint processes ONLY the new file
    epochs.clear()
    _write_day(
        landing,
        "2025-01-02",
        "d2.csv",
        [{"uuid": "u3", "created_at": "2025-01-02 00:00:00"}],
    )
    q2 = start_decisions_stream(
        spark, str(landing), ckpt, sink, available_now=True
    )
    q2.awaitTermination(120)
    batch2 = [r["uuid"] for e in epochs for r in e]
    assert batch2 == ["u3"]  # checkpoint: day-1 file not reprocessed
