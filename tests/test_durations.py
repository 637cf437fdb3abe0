import pytest

from faxe_spark.durations import parse_duration_ms, duration_to_interval


def test_units():
    # reference semantics: faxe_time_tests.erl:19-47
    assert parse_duration_ms("10ms") == 10
    assert parse_duration_ms("5s") == 5000
    assert parse_duration_ms("3m") == 180_000
    assert parse_duration_ms("3h") == 10_800_000
    assert parse_duration_ms("2d") == 172_800_000
    assert parse_duration_ms("1w") == 604_800_000


def test_compound_and_negative():
    assert parse_duration_ms("1h30m") == 5_400_000
    assert parse_duration_ms("-5s") == -5000
    assert parse_duration_ms(1500) == 1500


def test_invalid():
    for bad in ("", "5x", "m5", "5 m"):
        with pytest.raises(ValueError):
            parse_duration_ms(bad)


def test_interval():
    assert duration_to_interval("5m") == "300 seconds"
    assert duration_to_interval("250ms") == "250 milliseconds"
