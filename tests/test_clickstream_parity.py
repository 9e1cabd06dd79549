"""Reference-parity tests on the native clickstream fixture (FIXTURES.md §B):
hand-computed golden values for the fan-out → histogram → report pipeline,
mirroring what Raport.py computes on its own data."""

from __future__ import annotations

import pytest

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.streaming import (
    clickstream,
)

USERS = [
    # user_id, name, email, age, city, gender
    (1, "Ala", "ala@x.pl", 30, "Gdansk", "Kobieta"),
    (2, "Bo", "bo@x.pl", 25, "Sopot", "Mężczyzna"),
    (3, "Cy", "cy@x.pl", 30, "Gdansk", "Mężczyzna"),
]

CLICKS = [
    # user_id, service — includes 'home' rows that must be dropped
    (1, "gitlab"),
    (1, "gitlab"),
    (2, "gitlab"),
    (2, "kafka"),
    (3, "kafka"),
    (3, "home"),
    (1, "home"),
]


@pytest.fixture(scope="module")
def messages(spark):
    users = spark.createDataFrame(
        USERS, "user_id long, name string, email string, age int, "
        "city string, gender string"
    )
    clicks = spark.createDataFrame(CLICKS, "user_id long, service string")
    return clickstream.fan_out_messages(clicks, users)


def test_fan_out_shape(messages):
    # 5 non-home clicks × 4 dimensions = 20 messages (serwer.js:84-118)
    assert messages.count() == 20
    topics = {r.topic for r in messages.select("topic").distinct().collect()}
    assert "gitlab_age" in topics and "kafka_clicks" in topics
    assert not any(t.startswith("home") for t in topics)


def test_topic_histograms(messages):
    hist = {
        (r.topic, r.value): r.cnt
        for r in clickstream.topic_histograms(messages).collect()
    }
    # gitlab: ages 30,30,25 → {'30': 2, '25': 1}  (Raport.py:76-88)
    assert hist[("gitlab_age", "30")] == 2
    assert hist[("gitlab_age", "25")] == 1
    assert hist[("gitlab_clicks", "1")] == 3
    assert hist[("kafka_clicks", "1")] == 2


def test_overall_clicks(messages):
    hist = clickstream.topic_histograms(messages)
    total = {
        r.service: r.total_clicks
        for r in clickstream.overall_clicks(hist).collect()
    }
    # Raport.py:144-148 semantics
    assert total == {"gitlab": 3, "kafka": 2}


def test_dimension_histograms_share(messages):
    hist = clickstream.topic_histograms(messages)
    dims = clickstream.dimension_histograms(hist).collect()
    rows = {(r.service, r.dimension, r.value): r for r in dims}
    assert ("home", "age", "30") not in {k for k in rows}  # R17
    g = rows[("gitlab", "age", "30")]
    assert g.cnt == 2 and abs(g.share - 2 / 3) < 1e-6  # pie % (R20)
    assert g.label == "30 (2)"  # f'{value} ({count})' (R21)
    # no clicks dimension in the per-dimension report (Raport.py:176-183)
    assert all(r.dimension in ("age", "city", "gender") for r in dims)
