"""Deterministic clickstream fixture generator.

Replaces the reference's Dask/Kafka event generator
(``create_data/create_event_logs.py``) with a seeded, dependency-free
one for tests: same wire shape — flat JSON envelope with
double-encoded ``context`` / ``event_properties`` strings, ISO-8601
``+09:00`` millisecond timestamps, a session-based next-event chain,
deterministic MD5-parity A/B assignment
(``create_event_logs.py:239-241``) — plus injected exact duplicates
(~0.7%) so the Silver dedup SLO path is exercised
(``README.md:126-138``).

Everything is derived from ``random.Random(seed)``: two runs with the
same seed produce byte-identical files, which the idempotency and
oracle tests rely on.
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import uuid
from datetime import datetime, timedelta

# Categorical domains per FIXTURES.md §1 (reference generator's
# distributions, create_event_logs.py:53-129, 629-658).
SEGMENTS = ("FEMALE_20S", "FEMALE_30S", "FEMALE_40_PLUS", "MALE_20S", "MALE_30S", "MALE_40_PLUS")
ACTIVITY_LEVELS = ("POWER_USER", "ACTIVE_EXPLORER", "PASSIVE_BROWSER")
COOKING_STYLES = (
    "DESSERT_FOCUSED",
    "HEALTHY_CONSCIOUS",
    "COMFORT_FOOD",
    "QUICK_CONVENIENT",
    "DIVERSE_EXPLORER",
)
PAGES = (
    ("start", "/start"),
    ("main", "/main"),
    ("recipe_detail", "/recipes/detail"),
    ("profile", "/profile"),
    ("search_result", "/search"),
)
LIST_TYPES = ("popular", "recent", "recommended")
KEYWORDS = ("kimchi", "pasta", "salad", "curry", "soup", "bread")
DISH_TYPES = ("밑반찬", "메인반찬", "국/탕", "찌개", "디저트", "면/만두", "밥/죽/떡", "샐러드")
INGREDIENT_TYPES = ("소고기", "돼지고기", "닭고기", "채소류", "해물류")
METHOD_TYPES = ("볶음", "끓이기", "부침", "조림", "찜", "튀김")
SITUATION_TYPES = ("일상", "초스피드", "손님접대", "다이어트")
DIFFICULTIES = ("아무나", "초급", "중급", "고급")
AB_SCENARIO = "personalized_ads_v1"
ANON_RATE = 0.05  # share of pure-anonymous sessions (user_id null)
LATE_RATE = 0.01  # events arriving in a bucket later than their event time
CORRUPT_RATE = 0.002  # malformed staging lines (truncated JSON, garbage)

# Session next-event chain (behavioral shape of the reference's Markov
# graph, create_event_logs.py:430-467 — transitions, not probabilities,
# are what downstream queries depend on).
NEXT_EVENTS = {
    "view_page": ("search_recipe", "view_recipe_list", "view_ads", "click_auth_button", "view_page"),
    "click_auth_button": ("auth_success", "view_page"),
    "auth_success": ("view_page", "search_recipe"),
    "search_recipe": ("view_recipe_list", "click_recipe", "search_recipe"),
    "view_recipe_list": ("click_recipe", "view_recipe_list", "view_page"),
    "click_recipe": ("view_recipe", "click_bookmark", "click_like", "create_comment"),
    "view_recipe": ("click_bookmark", "click_like", "create_comment", "view_page"),
    "click_bookmark": ("view_page", "view_recipe_list"),
    "click_like": ("view_page", "create_comment"),
    "create_comment": ("view_page",),
    "create_recipe_success": ("view_page",),
    "view_ads": ("click_ads", "view_page", "view_page", "view_page"),
    "click_ads": ("view_page",),
}


def ab_group(user_id: str) -> str:
    """MD5-parity assignment — deterministic, mirrors the reference."""
    return "treatment" if int(hashlib.md5(user_id.encode()).hexdigest(), 16) % 2 else "control"


def _iso_kst(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond // 1000:03d}+09:00"


def generate_users(rng: random.Random, n_users: int) -> list[dict]:
    users = []
    for i in range(n_users):
        uid = f"user_{i:05d}"
        users.append(
            {
                "user_id": uid,
                "anonymous_id": f"anon-{uuid.UUID(int=rng.getrandbits(128)).hex[:12]}",
                "user_segment": rng.choice(SEGMENTS),
                "cooking_style": rng.choice(COOKING_STYLES),
                "activity_level": rng.choice(ACTIVITY_LEVELS),
                "ab_test_group": ab_group(uid),
            }
        )
    return users


def _event_properties(rng: random.Random, name: str, n_recipes: int) -> dict:
    props: dict = {}
    if name in ("click_recipe", "view_recipe", "click_bookmark", "click_like", "create_comment"):
        props["recipe_id"] = str(rng.randrange(1, n_recipes + 1))
    if name == "search_recipe":
        props["search_keyword"] = rng.choice(KEYWORDS)
        props["result_count"] = rng.randrange(0, 50)
    if name == "view_recipe_list":
        props["list_type"] = rng.choice(LIST_TYPES)
    if name in ("view_recipe", "view_page"):
        # duration payload parsed by the Gold measure split(action,":")[1]
        props["action"] = f"stay:{rng.randrange(5, 600)}"
    # properties the Silver projection intentionally drops (schema drift)
    if name in ("view_ads", "click_ads"):
        props["ad_id"] = f"ad_{rng.randrange(1, 20):03d}"
        props["position"] = rng.randrange(1, 5)
    return props


def generate_events(
    rng: random.Random,
    users: list[dict],
    start: datetime,
    n_days: int,
    sessions_per_user_day: float = 0.8,
    events_per_session: int = 8,
    dup_rate: float = 0.007,
    span_seconds: int = 86_000,
) -> list[dict]:
    """Flat JSON event dicts in arrival order (within-session time order).
    ``span_seconds`` bounds session start offsets within each day — a
    small span concentrates events into few 15-min buckets (used by the
    incremental-interval benchmark)."""
    events: list[dict] = []
    for day in range(n_days):
        day_start = start + timedelta(days=day)
        for u in users:
            if rng.random() > sessions_per_user_day:
                continue
            session_id = f"s-{uuid.UUID(int=rng.getrandbits(128)).hex[:16]}"
            t = day_start + timedelta(seconds=rng.randrange(0, span_seconds))
            # Anonymous traffic: user_id null, anonymous_id present
            # (FIXTURES.md §1 — exercises the fact's user_dim_key=0 path).
            anonymous = rng.random() < ANON_RATE
            name = "view_page"
            for _ in range(rng.randrange(2, events_per_session + 1)):
                page = rng.choice(PAGES)
                context = {
                    "page": {"name": page[0], "url": page[1], "path": page[1]},
                    "user_segment": u["user_segment"],
                    "activity_level": u["activity_level"],
                    "cooking_style": u["cooking_style"],
                    "ab_test": {
                        "scenario": AB_SCENARIO,
                        "group": u["ab_test_group"],
                        "start_date": "2025-08-01",
                        "end_date": "2025-08-31",
                    },
                }
                # Late event: its event time precedes its arrival bucket
                # by >1 day — lands in an older Silver partition.
                event_t = t - timedelta(hours=26) if rng.random() < LATE_RATE else t
                ev = {
                    "event_name": name,
                    "event_id": str(uuid.UUID(int=rng.getrandbits(128))),
                    "user_id": None if anonymous else u["user_id"],
                    "anonymous_id": u["anonymous_id"],
                    "session_id": session_id,
                    "timestamp": _iso_kst(event_t),
                    "date": event_t.strftime("%Y-%m-%d"),
                    "context": json.dumps(context),
                    "event_properties": json.dumps(
                        _event_properties(rng, name, n_recipes=200)
                    ),
                    "_arrival": _iso_kst(t),  # staging bucket key, stripped on write
                }
                events.append(ev)
                if rng.random() < dup_rate:  # exact duplicate (at-least-once delivery)
                    events.append(dict(ev))
                t += timedelta(seconds=rng.randrange(3, 300))
                name = rng.choice(NEXT_EVENTS[name])
    return events


def write_jsonl(events: list[dict], staging_dir: str, partitioned: bool = True) -> list[str]:
    """Write events as JSONL under the reference's path layout
    (``year=/month=/day=/hour=/minute=``) or as one bulk file."""
    os.makedirs(staging_dir, exist_ok=True)
    corrupt_rng = random.Random(1234)
    files: dict[str, list[str]] = {}
    for ev in events:
        ev = dict(ev)
        arrival = ev.pop("_arrival", ev["timestamp"])
        if partitioned:
            dt = datetime.strptime(arrival[:16], "%Y-%m-%dT%H:%M")
            bucket = (dt.minute // 15) * 15
            d = os.path.join(
                staging_dir,
                f"year={dt.year:04d}",
                f"month={dt.month:02d}",
                f"day={dt.day:02d}",
                f"hour={dt.hour:02d}",
                f"minute={bucket:02d}",
            )
            path = os.path.join(d, "events.jsonl")
        else:
            path = os.path.join(staging_dir, "bulk_events.jsonl")
        line = json.dumps(ev)
        if corrupt_rng.random() < CORRUPT_RATE:  # truncated / garbage line
            line = line[: len(line) // 2] if corrupt_rng.random() < 0.5 else "!!not-json!!"
        files.setdefault(path, []).append(line)
    for path, lines in files.items():
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
    return sorted(files)


def write_recipe_master(rng: random.Random, path: str, n_recipes: int = 200) -> None:
    """Recipe master parquet (dim_recipe source, create_dims.py:107-135)."""
    import pandas as pd

    rows = [
        {
            "recipe_id": str(i),
            "recipe_name": f"recipe_{i:04d}",
            "dish_type": rng.choice(DISH_TYPES),
            "ingredient_type": rng.choice(INGREDIENT_TYPES),
            "method_type": rng.choice(METHOD_TYPES),
            "situation_type": rng.choice(SITUATION_TYPES),
            "difficulty": rng.choice(DIFFICULTIES),
            "cooking_time": int(rng.randrange(5, 120)),
        }
        for i in range(1, n_recipes + 1)
    ]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pd.DataFrame(rows).to_parquet(path, index=False)


def generate_fixture(
    root: str,
    *,
    seed: int = 7,
    n_users: int = 60,
    n_days: int = 3,
    start: datetime | None = None,
    partitioned: bool = True,
    span_seconds: int = 86_000,
) -> dict:
    """Full fixture: staging JSONL + recipe master. Returns paths."""
    rng = random.Random(seed)
    users = generate_users(rng, n_users)
    events = generate_events(
        rng, users, start or datetime(2025, 9, 1, 0, 0, 0), n_days, span_seconds=span_seconds
    )
    staging = os.path.join(root, "staging")
    files = write_jsonl(events, staging, partitioned=partitioned)
    master = os.path.join(root, "masters", "recipes.parquet")
    write_recipe_master(random.Random(seed + 1), master, n_recipes=200)
    return {
        "staging_dir": staging,
        "recipe_master": master,
        "files": files,
        "n_events": len(events),
        "users": users,
    }
