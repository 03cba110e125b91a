"""End-to-end pipeline parity (SURVEY.md §0 table, §3 lifecycles).

The reference runs six subject pipelines, each an eager
extract → transform → load chain into a keyed warehouse
(reference README.md:3-7).  Here each pipeline is a *lazy
composition* of the engine's operators — one Catalyst plan from
staged input to MERGE — so a user of the reference can run the same
end-to-end flows on Spark:

| pipeline      | reference transform            | engine module   |
|---------------|--------------------------------|-----------------|
| season        | season_transform.py:49-80      | season.py       |
| episodes      | episodes_transform.py:269-311  | episodes.py     |
| contestant    | contestant_transform.py:155-226| contestant.py   |
| episode_stats | episode_stats_transform.py:173-193 | episode_stats.py |
| confessional  | confessional_transform.py:36-67| confessional.py |
| reddit        | reddit_transform.py:49-89      | reddit.py       |

Loads go through ``warehouse.Warehouse`` (B3 load drivers over the
B1 MERGE sink, conflict keys from SURVEY.md §1.2).
"""

from .confessional import transform_confessional  # noqa: F401
from .contestant import transform_contestants  # noqa: F401
from .episode_stats import transform_episode_stats  # noqa: F401
from .episodes import transform_episodes  # noqa: F401
from .reddit import transform_reddit  # noqa: F401
from .season import transform_season  # noqa: F401
from .warehouse import CONFLICT_KEYS, Warehouse  # noqa: F401
