from .sources import read_commits_stream, read_commit_geo_stream, read_events_stream
from .queries import (
    question_one_stream,
    question_two_stream,
    question_three_stream,
    question_four_stream,
    question_five_stream,
    question_six_stream,
    question_seven_stream,
    question_eight_join_stream,
)
from .cep_stream import followed_by_stream
from .dedup_stream import dedup_stream, exact_dedup_stream

__all__ = [
    "dedup_stream",
    "exact_dedup_stream",
    "read_commits_stream",
    "read_commit_geo_stream",
    "read_events_stream",
    "question_one_stream",
    "question_two_stream",
    "question_three_stream",
    "question_four_stream",
    "question_five_stream",
    "question_six_stream",
    "question_seven_stream",
    "question_eight_join_stream",
    "followed_by_stream",
]
