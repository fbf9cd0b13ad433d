"""Reference-shaped JSON fixtures (FIXTURES.md §A).

Synthetic rows in the exact raw shapes of the reference's two S3 inputs
(reference README.md:31-42), exercising every implicit ingestion cast and
dedup/join semantic:
- userId as string incl. "" (logged-out rows);
- ts / registration as epoch milliseconds (registration fractional);
- status as JSON number;
- duplicate (userId, firstName, lastName, gender) tuples;
- duplicate ts values (DISTINCT-time < events, cf. 8023 < 8056);
- rows whose (artist, song, length) match a song row — incl. the
  cross-scale decimal equality length(12,4) == duration(12,6);
- duplicate song_id rows, null lat/long, year 0.
"""

from __future__ import annotations

import json
from pathlib import Path

BASE_TS = 1_541_000_000_000  # 2018-10-31T15:33:20Z in epoch millis


def event(ts_off=0, user_id="101", artist=None, song=None, length=None, **kw):
    row = {
        "artist": artist,
        "auth": "Logged In" if user_id else "Logged Out",
        "firstName": kw.get("firstName", "Ada"),
        "gender": kw.get("gender", "F"),
        "itemInSession": kw.get("itemInSession", 0),
        "lastName": kw.get("lastName", "Lovelace"),
        "length": length,
        "level": kw.get("level", "free"),
        "location": kw.get("location", "London"),
        "method": "PUT",
        "page": kw.get("page", "NextSong"),
        "registration": kw.get("registration", BASE_TS - 86_400_000 + 0.5),
        "sessionId": kw.get("sessionId", 42),
        "song": song,
        "status": kw.get("status", 200),
        "ts": BASE_TS + ts_off,
        "userAgent": "Mozilla/5.0",
        "userId": user_id,
    }
    return row


def song(song_id="S1", title="Song One", artist_id="A1", artist_name="Artist One",
         duration=200.1234, lat=51.5, lon=-0.12, year=2001, location="UK"):
    return {
        "num_songs": 1,
        "artist_id": artist_id,
        "artist_latitude": lat,
        "artist_longitude": lon,
        "artist_location": location,
        "artist_name": artist_name,
        "song_id": song_id,
        "title": title,
        "duration": duration,
        "year": year,
    }


EVENTS = [
    # two duplicate user tuples (same projected user row) at distinct ts
    event(ts_off=0, user_id="101"),
    event(ts_off=1_000, user_id="101"),
    # duplicate ts (same as first row) → DISTINCT time collapses it
    event(ts_off=0, user_id="102", firstName="Grace", lastName="Hopper"),
    # logged-out rows: userId "" → NULL, excluded from users dim
    event(ts_off=2_000, user_id="", page="Home", status=307),
    event(ts_off=3_000, user_id="", page="Login"),
    # a played song that matches the songs fixture on all 3 keys
    # (length 200.1234 == duration 200.123400 cross-scale decimal equality)
    event(ts_off=4_000, user_id="103", firstName="Alan", lastName="Turing",
          gender="M", artist="Artist One", song="Song One", length=200.1234,
          level="paid"),
    # same artist/title but wrong length → no match (NULL ids kept)
    event(ts_off=5_000, user_id="103", firstName="Alan", lastName="Turing",
          gender="M", artist="Artist One", song="Song One", length=200.2),
    # GET/Home row with status number, stays in fact (no page filter!)
    event(ts_off=6_000, user_id="104", firstName="Edsger", lastName="Dijkstra",
          gender="M", page="Home", status=404),
]

SONGS = [
    song(),
    song(),  # exact duplicate row → dims dedup to one
    song(song_id="S2", title="Song Two", artist_id="A2", artist_name="Artist Two",
         duration=180.5, year=0, lat=None, lon=None),
    # second artist row for A1 with same attrs → artists dedup keeps one
    song(song_id="S3", title="Song Three", artist_id="A1", artist_name="Artist One",
         duration=123.456789),
]

EXPECT = {
    # no page filter (all 8 events) + the duplicate staged song row matches
    # the same event twice — the reference joins *staging* (not the deduped
    # dim), so duplicate song metadata multiplies fact rows. Faithful.
    "songplay_rows": len(EVENTS) + 1,
    "matched_songplays": 2,
    "users_rows": 4,  # 101, 102, 103, 104 ("" → NULL filtered)
    "songs_rows": 3,
    "artists_rows": 2,
    "time_rows": len(EVENTS) - 1,  # one duplicate ts
}


def write_fixtures(tmpdir: str | Path) -> tuple[str, str]:
    tmpdir = Path(tmpdir)
    events_path = tmpdir / "events.json"
    songs_path = tmpdir / "songs.json"
    events_path.write_text("\n".join(json.dumps(r) for r in EVENTS))
    songs_path.write_text("\n".join(json.dumps(r) for r in SONGS))
    return str(events_path), str(songs_path)
