"""Oracle SQL shared between batch and streaming query packs.

The streaming session/sliding-window queries are verified against the
SAME DuckDB oracles as their batch counterparts (stream-batch parity is
the whole point of Structured Streaming's unified model). Those shared
strings live here — a leaf module with no package-internal imports — so
``streaming.windows`` can use them without importing the
``operators`` package. Importing ``operators.rollups`` from inside
``streaming.windows`` at module scope creates a cycle: a test that
imports ``streaming.windows`` first triggers ``operators/__init__``,
which re-imports the still-partially-initialized windows module and
silently builds ``ALL_ORACLES`` without the stream entries (QUERIES was
already defined, ORACLES not yet). This module breaks that cycle.
"""

from __future__ import annotations

# DuckDB reads events.ts at its native precision; truncate to µs so both
# engines bucket identical inputs (FIXTURES.md §1.4). Identity under the
# current timestamp[us] testdata; kept for robustness to ns testdata.
EVENTS_US = "(SELECT * REPLACE (make_timestamp(epoch_us(ts)) AS ts) FROM events)"

# Sessionization with a 1-hour inactivity gap — oracle for BOTH
# ext_session_window (batch) and stream_session_windows (streaming).
SESSION_WINDOW_ORACLE = f"""
        WITH e AS (SELECT * FROM {EVENTS_US}),
        marked AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL '1 hour'
                        THEN 1 ELSE 0 END AS new_sess
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM marked
        )
        SELECT user_id,
               CAST(floor(epoch(MIN(ts))) AS BIGINT) AS sess_start_s,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS sum_cents
        FROM sess GROUP BY user_id, sess_id
    """

# 48h windows sliding by 24h — oracle for BOTH ext_sliding_window
# (batch) and stream_sliding_counts (streaming).
SLIDING_WINDOW_ORACLE = """
        SELECT strftime(date_trunc('day', ts) - offs.i * INTERVAL '1 day',
                        '%Y-%m-%d') AS win_start,
               event_type, COUNT(*) AS n_events
        FROM events, (VALUES (0), (1)) AS offs(i)
        GROUP BY 1, 2
    """
