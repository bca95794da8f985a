"""Parity tests for the titlecase port (FIXTURES.md §6.1; reference
main.py:90-91,145-168)."""

import pytest

from rlis2osm_spark.functions.titlecase_port import rlis_titlecase


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("NORTHWEST EVERETT STREET", "Northwest Everett Street"),
        ("45TH AVENUE", "45th Avenue"),  # digit-led word returned unchanged
        ("99W HIGHWAY", "99w Highway"),  # .upper() discarded -> stays lower
        (None, ""),  # null name -> '' (main.py:90)
        ("", ""),
        ("AVENUE OF THE STATES", "Avenue of the States"),
        ("MARTIN LUTHER KING JUNIOR BOULEVARD",
         "Martin Luther King Junior Boulevard"),
        # edited small-word list: 'with' lowercased, 'v' capitalized
        ("HIGHWAY WITH A VIEW", "Highway with a View"),
        ("JOHN V SMITH", "John V Smith"),
        # hyphenated compound from dash-delimited names (no spaces)
        ("GARDENIA STREET-EAST STREET CONNECTOR",
         "Gardenia Street-East Street Connector"),
        ("GOING/GREELEY COURT", "Going/Greeley Court"),
        # small word first/last gets capitalized
        ("THE RAMP", "The Ramp"),
        ("MCDONALD STREET", "McDonald Street"),
    ],
)
def test_rlis_titlecase(raw, expected):
    # pipeline always lowercases before titlecase (main.py:90)
    assert rlis_titlecase(raw) == expected
