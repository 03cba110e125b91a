"""End-to-end pipeline parity tests: fixture frames shaped like the
reference's staged extracts → transform → warehouse MERGE →
idempotent re-merge (SURVEY.md §3 lifecycles, N3 replay)."""

from __future__ import annotations

import pyspark.sql.functions as F

from survivor_processing_spark.pipelines import (
    Warehouse,
    transform_confessional,
    transform_contestants,
    transform_episode_stats,
    transform_episodes,
    transform_reddit,
    transform_season,
)


def test_season_pipeline(spark):
    raw = spark.createDataFrame(
        [
            (1, "Borneo", "May 31 – August 23, 2000", "1", "39", "13",
             ["Richard"], ["Kelly"]),
            (None, "Australia", "January 28, 2001 – May 3, 2001", "2", "42",
             "15", ["Tina"], ["Colby", "Keith"]),
        ],
        "season_id long, name string, air_dates string, season string, "
        "days string, episodes string, winner array<string>, runnerup array<string>",
    )
    out = transform_season(raw)["season"]
    rows = {r.name: r for r in out.collect()}
    assert rows["Borneo"].showing_started.month == 5
    assert rows["Borneo"].showing_ended.year == 2000
    assert rows["Australia"].runnerup_1 == "Keith"
    assert rows["Australia"].season_id == 2  # minted max(1)+1
    assert rows["Borneo"].days == 39.0


def test_episodes_pipeline(spark):
    raw = spark.createDataFrame(
        [
            (
                101, 1, "The Marooning", "2000-05-31 20:00:00",
                "5.1/9 (18-49)", "15.51 million viewers", "1/13 (1)",
                {"Richard Hatch": ["I'm the winner."]},
                {"Sonja Christopher": ["Goodbye."]},
                {"narrator": ["39 days, 16 people, 1 survivor"]},
            )
        ],
        "episode_id long, season long, title string, firstbroadcast string, "
        "share_txt string, viewership_txt string, number_txt string, "
        "voting_confessionals map<string,array<string>>, "
        "final_words map<string,array<string>>, "
        "story_quotes map<string,array<string>>",
    )
    name_dim = spark.createDataFrame(
        [("Richard Hatch", 1, 11), ("Sonja Christopher", 1, 12)],
        "full_name string, season long, contestant_season_id long",
    )
    out = transform_episodes(raw, name_dim)
    ep = out["episode"].collect()[0]
    assert ep.viewership == 15.51e8
    assert ep.overall_rating == 5.1
    assert ep.number_in_season == 1
    vc = out["voting_confessional"].collect()[0]
    assert vc.voter_id == 11 and vc.content == "I'm the winner."
    fw = out["final_words"].collect()[0]
    assert fw.contestant_id == 12
    assert out["story_quotes"].count() == 1


def test_contestant_pipeline(spark):
    raw = spark.createDataFrame(
        [
            (
                1001, 11, 1, "Richard", "Hatch", "M", "1961-04-08",
                ["Tagi", "Rattana"], ["Tagi Alliance"], ["Pagong", "Tagi"],
            )
        ],
        "contestant_season_id long, contestant_id long, season_id long, "
        "first_name string, last_name string, sex string, birthdate string, "
        "tribes array<string>, alliances array<string>, opponents array<string>",
    )
    tribes = spark.createDataFrame(
        [("Tagi", 21), ("Pagong", 22), ("Rattana", 23)],
        "name string, tribe_id long",
    )
    agg = spark.createDataFrame(
        [(1001, 3.0, 1)], "contestant_season_id long, ndays double, placement long"
    )
    out = transform_contestants(raw, tribes, agg)
    c = out["contestant"].collect()[0]
    assert (c.first_name, c.sex) == ("Richard", "M")
    cs = out["contestant_season"].collect()[0]
    assert cs.tribe_0 == "Tagi" and cs.tribe_2 is None
    assert cs.opponent_0 == 22 and cs.opponent_1 == 21
    assert cs.placement == 1


def test_episode_stats_pipeline(spark):
    name_map = spark.createDataFrame(
        [("rich_1", 1001), ("sue_1", 1002)],
        "merge_key string, contestant_season_id long",
    )
    tc = spark.createDataFrame(
        [
            (1, 101, 1, "Rich", "Sue", 9.0, True),
            (1, 101, 1, "Rich", "Sue", 8.0, True),  # revote
            (1, 101, 1, "Sue", None, 9.0, False),   # no vote -> filtered
        ],
        "season_id long, episode_id long, tc_number long, voter string, "
        "voted_for string, total_players_remaining double, vote_counted boolean",
    )
    ic = spark.createDataFrame(
        [(1, 101, None, "Rich", None, None, None)],
        "season_id long, episode_id long, tc_number long, contestant string, "
        "win double, win_alt double, win_pct double",
    )
    rc = spark.createDataFrame(
        [(1, 101, None, None, "Rich", None, None, None)],
        "season_id long, episode_id long, tc_number long, challenge_number long, "
        "contestant string, win_pct double, team double, episode_win_pct double",
    )
    ep = spark.createDataFrame(
        [(1, 101, "Rich", 1.0, 2.0), (1, 101, "Rich", 1.0, 3.0)],
        "season_id long, episode_id long, contestant string, "
        "challenge_wins double, votes_against_player double",
    )
    out = transform_episode_stats(
        {
            "tribal_council": tc,
            "reward_challenge": rc,
            "immunity_challenge": ic,
            "overall_episode": ep,
        },
        name_map,
    )
    votes = out["vote"].orderBy("vote_number").collect()
    assert [v.vote_number for v in votes] == [1, 2]
    assert votes[0].voted_for_id == 1002
    ic_row = out["immunity_challenge"].collect()[0]
    assert (ic_row.win, ic_row.win_pct, ic_row.tc_number) == (1.0, 0.25, 0)
    rc_row = out["reward_challenge"].collect()[0]
    assert (rc_row.team, rc_row.episode_win_pct, rc_row.challenge_number) == (
        4.0, 1.25, 1,
    )
    eps = out["episode_performance_stats"].collect()[0]
    assert eps.challenge_wins == 2.0 and eps.votes_against_player == 5.0


def test_confessional_pipeline(spark):
    raw = spark.createDataFrame(
        [
            (1, 2, "Rich", 1, 3, "quote one", 7, 1),
            (1, 2, "Unknown Person", 2, 3, "quote two", 7, 2),
        ],
        "season long, episode long, contestant string, n_in_episode long, "
        "total_in_episode long, content string, day long, para_order long",
    )
    dim = spark.createDataFrame(
        [(1, "Rich", 11)], "season long, first_name string, contestant_id long"
    )
    out = transform_confessional(raw, dim)
    ok = out["confessional"].collect()
    assert len(ok) == 1 and ok[0].contestant_id == 11
    q = out["confessional_quarantine"].collect()
    assert len(q) == 1 and q[0].content == "quote two"


def test_reddit_pipeline_and_warehouse_idempotence(spark, tmp_path):
    seasons = spark.createDataFrame(
        [(1, "2000-05-31 00:00:00", "2000-08-23 00:00:00")],
        "season_id long, showing_started string, showing_ended string",
    ).select(
        "season_id",
        F.to_timestamp("showing_started").alias("showing_started"),
        F.to_timestamp("showing_ended").alias("showing_ended"),
    )
    episodes = spark.createDataFrame(
        [(101, "2000-05-31 20:00:00"), (102, "2000-06-07 20:00:00")],
        "episode_id long, firstbroadcast string",
    ).select("episode_id", F.to_timestamp("firstbroadcast").alias("firstbroadcast"))

    subs = spark.createDataFrame(
        [
            ("s1", 960000000, ["tag1", "tag2"]),   # 2000-06-03: in season
            ("s2", 1100000000, None),              # 2004: after season end
        ],
        "id string, created_utc long, tags array<string>",
    )
    comments = spark.createDataFrame(
        [("c1", 960500000, None)], "id string, created_utc long, tags array<string>"
    )
    out = transform_reddit(subs, comments, seasons, episodes)
    rows = {r.id: r for r in out["reddit_submissions"].collect()}
    assert rows["s1"].most_recent_season == 1
    assert rows["s1"].most_recent_episode == 101
    assert rows["s2"].most_recent_season is None  # containment null-out
    assert rows["s2"].most_recent_episode == 102
    assert rows["s1"].tags == '["tag1","tag2"]'  # L5 stringified

    # warehouse load + replay idempotence (N3)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.load({"reddit_submissions": out["reddit_submissions"]})
    first = wh.read("reddit_submissions").count()
    wh.load({"reddit_submissions": out["reddit_submissions"]})
    assert wh.read("reddit_submissions").count() == first == 2
