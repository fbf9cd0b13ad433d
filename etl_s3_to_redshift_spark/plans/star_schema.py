"""The reference-equivalent star-schema build, Spark-first.

Rebuilds every INSERT-SELECT of the reference (sql_queries.py:132-190) as a
lazy DataFrame plan over the two staged inputs, in the reference's own
insert order (sql_queries.py:197): songplay, users, songs, artists, time.

Faithfulness notes (SURVEY.md §5, §7):
- NO ``page = 'NextSong'`` filter — this fork of the Sparkify pipeline does
  not filter (8,056 songplays = all staged events, test_etl.ipynb cell-8/9).
- NO surrogate key on the fact (README.md:52 is wrong vs the DDL).
- DISTINCT dedups the full projected tuple, not by key (sql_queries.py:157).
- The 3-key join keeps decimal keys decimal (duration numeric(12,6) =
  length numeric(12,4), sql_queries.py:150) — cross-scale decimal equality.
- The songs dimension is broadcast, mirroring ``diststyle all``
  (sql_queries.py:85,95,105,116; README.md:75): at 100 TB the events fact
  never shuffles for this join.

The full-refresh lifecycle of etl.py:22-34 (drop/create/copy/insert/drop
staging) collapses to: read → build plans → ``write(mode='overwrite')``;
``run_pipeline`` mirrors the fail-fast stage structure of etl.py:55-109.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.relational import (
    date_parts,
    distinct_projection,
    multi_key_left_join,
)
from etl_s3_to_redshift_spark.sources.json_source import read_events_json, read_songs_json
from etl_s3_to_redshift_spark.sources.sinks import write_parquet


def build_songplay(events: DataFrame, songs: DataFrame) -> DataFrame:
    """Fact table (reference sql_queries.py:132-151).

    ``staging_events e LEFT OUTER JOIN staging_songs s ON
    s.artist_name = e.artist AND s.title = e.song AND s.duration = e.length``
    — unmatched events kept with NULL song_id/artist_id (the dominant case,
    test_etl.ipynb cell-9).
    """
    joined = multi_key_left_join(
        events,
        songs,
        on=[("artist", "artist_name"), ("song", "title"), ("length", "duration")],
        broadcast_right=True,
    )
    return joined.select(
        events["ts"].alias("start_time"),
        events["userId"].alias("user_id"),
        events["level"].alias("level"),
        songs["song_id"].alias("song_id"),
        songs["artist_id"].alias("artist_id"),
        events["sessionId"].cast("string").alias("session_id"),
        events["location"].alias("location"),
        events["userAgent"].alias("user_agent"),
    )


def build_users(events: DataFrame) -> DataFrame:
    """users dim (reference sql_queries.py:155-160): DISTINCT projected
    tuple, NULL userId rows dropped."""
    return distinct_projection(
        events,
        {
            "user_id": "userId",
            "first_name": "firstName",
            "last_name": "lastName",
            "gender": "gender",
        },
        not_null="userId",
    )


def build_songs(songs: DataFrame) -> DataFrame:
    """songs dim (reference sql_queries.py:163-168)."""
    return distinct_projection(
        songs,
        {
            "song_id": "song_id",
            "song_title": "title",
            "artist_id": "artist_id",
            "year": "year",
            "duration": "duration",
        },
        not_null="song_id",
    )


def build_artists(songs: DataFrame) -> DataFrame:
    """artists dim (reference sql_queries.py:171-177).

    The insert list puts latitude before longitude (sql_queries.py:172-174)
    while the DDL declares longitude first — name-based select makes the
    ordering question moot, but the lat/long → decimal(11,8) widening from
    the staged decimal(11,3) is kept (sql_queries.py:56-57 vs :103-104).
    """
    return distinct_projection(
        songs,
        {
            "artist_id": "artist_id",
            "artist_name": "artist_name",
            "artist_location": "artist_location",
            "artist_longitude": F.col("artist_longitude").cast("decimal(11,8)"),
            "artist_latitude": F.col("artist_latitude").cast("decimal(11,8)"),
        },
        not_null="artist_id",
    )


def build_time(events: DataFrame) -> DataFrame:
    """time dim (reference sql_queries.py:180-189): DISTINCT timestamps with
    extracted date parts. DISTINCT is applied to the projected tuple — all
    parts are functions of ts, so this equals DISTINCT ts (8,023 < 8,056
    events in the reference's golden counts, test_etl.ipynb cell-17)."""
    parts = date_parts("ts")
    return events.select(
        F.col("ts").alias("start_time"),
        parts["hour"].alias("hour"),
        parts["day"].alias("day"),
        parts["week"].alias("week"),
        parts["month"].alias("month"),
        parts["year"].alias("year"),
    ).distinct()


@dataclass
class StarSchema:
    songplay: DataFrame
    users: DataFrame
    songs: DataFrame
    artists: DataFrame
    time: DataFrame

    def tables(self) -> dict[str, DataFrame]:
        return {
            "songplay": self.songplay,
            "users": self.users,
            "songs": self.songs,
            "artists": self.artists,
            "time": self.time,
        }


def build_star_schema(events: DataFrame, songs: DataFrame) -> StarSchema:
    """All five outputs as lazy plans (reference insert order,
    sql_queries.py:197)."""
    return StarSchema(
        songplay=build_songplay(events, songs),
        users=build_users(events),
        songs=build_songs(songs),
        artists=build_artists(songs),
        time=build_time(events),
    )


# Sort keys mirror the reference DDL (sql_queries.py:68,81,90,100,110);
# on parquet they become row-group min/max stats → zone-map pruning.
SORT_KEYS = {
    "songplay": "start_time",
    "users": "user_id",
    "songs": "song_id",
    "artists": "artist_id",
    "time": "start_time",
}


def run_pipeline(
    spark: SparkSession,
    events_path: str,
    songs_path: str,
    out_dir: str,
) -> dict[str, str]:
    """End-to-end full refresh mirroring etl.py:55-109.

    read (COPY) → build (INSERT-SELECT) → overwrite-write (full refresh).
    Fail-fast: any stage exception propagates (the reference prints-and-
    returns, etl.py:70-106; raising is the honest Spark equivalent).
    Returns {table: output_path}.
    """
    events = read_events_json(spark, events_path)
    songs = read_songs_json(spark, songs_path)
    star = build_star_schema(events, songs)
    out: dict[str, str] = {}
    for name, df in star.tables().items():
        path = f"{out_dir}/{name}"
        write_parquet(df, path, sort_key=SORT_KEYS[name])
        out[name] = path
    # Staging cleanup (etl.py:31-34) is implicit: the staged frames are
    # unreferenced lazy plans after this point — nothing was cached.
    return out
