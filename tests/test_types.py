"""Options parser / enum behavior vs the reference contract
(src/sqlite-vector.c:772-992)."""

import pytest

from sqlite_vector_tpu.errors import VectorConfigError
from sqlite_vector_tpu.types import (
    DEFAULT_MAX_MEMORY,
    DistanceMetric,
    QuantType,
    VectorOptions,
    VectorType,
    human_to_number,
    parse_options,
)


def test_defaults_match_reference():
    opts = parse_options(None)
    assert opts.type is VectorType.F32
    assert opts.distance is DistanceMetric.L2
    assert opts.max_memory == DEFAULT_MAX_MEMORY == 30 * 1024 * 1024
    assert opts.qtype is QuantType.AUTO
    assert opts.dimension == 0
    assert opts.normalized is False


def test_basic_parse():
    opts = parse_options("type=FLOAT16,dimension=384,distance=cosine")
    assert opts.type is VectorType.F16
    assert opts.dimension == 384
    assert opts.distance is DistanceMetric.COSINE


def test_case_insensitive_and_spaces():
    opts = parse_options("  TYPE = floatb16 , DIMENSION = 12 ,distance= DOT ")
    assert opts.type is VectorType.BF16
    assert opts.dimension == 12
    assert opts.distance is DistanceMetric.DOT


def test_distance_aliases():
    # EUCLIDEAN->L2, INNER->DOT, MANHATTAN->L1 (reference :798-808)
    assert parse_options("distance=euclidean").distance is DistanceMetric.L2
    assert parse_options("distance=inner").distance is DistanceMetric.DOT
    assert parse_options("distance=manhattan").distance is DistanceMetric.L1
    assert parse_options("distance=squared_l2").distance is DistanceMetric.SQUARED_L2


def test_unknown_keys_ignored():
    opts = parse_options("bogus=1,dimension=4,alsobogus=x")
    assert opts.dimension == 4


def test_malformed_pairs_skipped():
    # a key with no '=' is skipped, parsing continues (reference :891-897)
    opts = parse_options("garbage,dimension=8")
    assert opts.dimension == 8


def test_invalid_type_raises():
    with pytest.raises(VectorConfigError, match="not a recognized type"):
        parse_options("type=FLOAT64")


def test_invalid_dimension_raises():
    with pytest.raises(VectorConfigError, match="positive integer"):
        parse_options("dimension=-3")
    with pytest.raises(VectorConfigError, match="positive integer"):
        parse_options("dimension=abc")


def test_invalid_distance_raises():
    with pytest.raises(VectorConfigError, match="not a recognized"):
        parse_options("distance=hamming")


def test_qtype():
    assert parse_options("qtype=INT8").qtype is QuantType.I8
    assert parse_options("qtype=uint8").qtype is QuantType.U8
    # INT4 is valid HERE (beyond the reference, ops/quantize4.py) — the C
    # extension rejects it; MIGRATION.md documents the divergence
    assert parse_options("qtype=int4").qtype is QuantType.I4
    with pytest.raises(VectorConfigError):
        parse_options("qtype=int2")


def test_max_memory_suffixes():
    # human_to_number (reference :916-933)
    assert human_to_number("64KB") == 64 * 1024
    assert human_to_number("50MB") == 50 * 1024 * 1024
    assert human_to_number("2GB") == 2 * 1024**3
    assert human_to_number("1.5MB") == int(1.5 * 1024 * 1024)
    assert human_to_number("123") == 123
    assert human_to_number("0") == 0
    assert human_to_number("12XB") == 0  # invalid suffix -> 0
    assert human_to_number("junk") == 0
    opts = parse_options("max_memory=50MB")
    assert opts.max_memory == 50 * 1024 * 1024


def test_normalized_parsed():
    # the reference parses `normalized` and never uses it
    # (src/sqlite-vector.c:966); we parse it identically AND exploit it for
    # the cosine pure-dot fast path (test_search.py::test_normalized_cosine*)
    opts = parse_options("normalized=1,dimension=4")
    assert opts.normalized is True


def test_type_names_roundtrip():
    for t in VectorType:
        assert VectorType.from_name(t.value) is t
    assert VectorType.from_name("float32") is VectorType.F32


def test_strtol_base0_dimension_parity():
    """dimension/normalized parse with C strtol(,,0) semantics (the
    reference, src/sqlite-vector.c:958,:965): hex and leading-zero octal
    accepted, longest-prefix, 0 on no parse — verified against the compiled
    extension in a one-off differential (octal '010' -> 8)."""
    from sqlite_vector_tpu.types import _strtol0

    assert _strtol0("010") == 8
    assert _strtol0("0x10") == 16
    assert _strtol0("10abc") == 10
    assert _strtol0("089") == 0  # strtol stops at '8' after octal '0'
    assert _strtol0("abc") == 0
    assert parse_options("dimension=010").dimension == 8
    assert parse_options("dimension=0x20").dimension == 32
    # qscale/qoffset: strtod never fails -> garbage must not crash
    parse_options("qscale=abc,qoffset=??,dimension=4")


def test_option_key_prefix_matching():
    """The reference matches option keys with strncasecmp(key, NAME,
    key_len) — any case-insensitive prefix selects the option, first match
    in declaration order wins (:952-989)."""
    from sqlite_vector_tpu.types import parse_options

    o = parse_options("dim=768,dist=cosine,norm=1,max=1KB,q=INT8,t=FLOAT16")
    assert o.dimension == 768
    assert o.distance.name == "COSINE"
    assert o.normalized is True
    assert o.max_memory == 1024
    assert o.qtype.name == "I8"
    assert o.type.name == "F16"
    # ambiguous 'd' selects dimension — checked before distance
    assert parse_options("d=5").dimension == 5


def test_human_to_number_strtod_parity():
    """strtod grammar (hex floats, ASCII-only whitespace/digits), 2-char
    suffix compare with trailing junk ignored, 0 on zero/inf/negative/
    invalid (reference :916-933)."""
    from sqlite_vector_tpu.types import human_to_number as h

    assert h("0x10KB") == 16 * 1024          # strtod parses hex
    assert h("5KBx") == 5 * 1024             # strncasecmp(end,"KB",2)
    assert h("5 KB") == 5 * 1024             # ASCII spaces skipped
    assert h("2.5MB") == int(2.5 * 1024 * 1024)
    assert h("1e3") == 1000
    assert h("٣MB") == 0                # Arabic-Indic digit: not ASCII
    assert h("5 KB") == 0               # NBSP is not strtod whitespace
    assert h("1e999") == 0                   # HUGE_VAL -> 0
    assert h("-3KB") == 0                    # negative -> 0
    assert h("0") == 0
    assert h("banana") == 0
    assert h("5TB") == 0                     # invalid suffix


def test_max_memory_assigned_unconditionally():
    """The reference stores human_to_number's result even when it is 0
    (parse failure) — `if (max_memory >= 0)` is always true for uint64."""
    from sqlite_vector_tpu.types import DEFAULT_MAX_MEMORY, parse_options

    assert parse_options("max_memory=banana").max_memory == 0
    assert parse_options("max_memory=4GB").max_memory == 4 * 1024**3
    assert parse_options("").max_memory == DEFAULT_MAX_MEMORY
