"""Tests for the on-device closed-form candidate decode.

Oracle: brute-force itertools.product with consecutive-duplicate filtering,
matching the reference's CompleteGraph iterator semantics
(differt-core/src/geometry/graph.rs:286-527).
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu.geometry import (
    count_path_candidates,
    generate_all_path_candidates,
    generate_all_path_candidates_chunks_iter,
    generate_all_path_candidates_iter,
    generate_path_candidates,
)


def brute_force(num_primitives: int, order: int) -> np.ndarray:
    if order == 0:
        return np.zeros((1, 0), dtype=np.int32)
    rows = [
        row
        for row in itertools.product(range(num_primitives), repeat=order)
        if all(a != b for a, b in zip(row, row[1:]))
    ]
    return np.asarray(rows, dtype=np.int32).reshape(-1, order)


@pytest.mark.parametrize(
    ("num_primitives", "order"),
    [(1, 0), (1, 1), (2, 1), (3, 1), (3, 2), (4, 3), (5, 4), (10, 2)],
)
def test_matches_brute_force(num_primitives: int, order: int) -> None:
    expected = brute_force(num_primitives, order)
    got = np.asarray(generate_all_path_candidates(num_primitives, order))
    assert got.shape == expected.shape
    np.testing.assert_array_equal(got, expected)
    assert count_path_candidates(num_primitives, order) == expected.shape[0]


def test_no_consecutive_duplicates() -> None:
    candidates = np.asarray(generate_all_path_candidates(7, 4))
    assert not np.any(candidates[:, :-1] == candidates[:, 1:])


def test_sharded_ranges_cover_everything() -> None:
    full = np.asarray(generate_all_path_candidates(6, 3))
    total = count_path_candidates(6, 3)
    parts = []
    chunk = 17  # Deliberately not dividing the total.
    for start in range(0, total, chunk):
        parts.append(
            np.asarray(
                generate_path_candidates(
                    6, 3, start=start, size=min(chunk, total - start)
                )
            )
        )
    np.testing.assert_array_equal(np.concatenate(parts, axis=0), full)


def test_large_start_index_decodes_exactly() -> None:
    # A start index beyond 2**32 exercises the exact big-int start decode.
    num_primitives, order = 1000, 5
    start = 123_456_789_012
    got = np.asarray(
        generate_path_candidates(num_primitives, order, start=start, size=4)
    )
    # Verify against direct digit decoding of each index.
    for offset in range(4):
        index = start + offset
        weights = [(num_primitives - 1) ** (order - 1 - t) for t in range(order)]
        rem = index
        digits = []
        for w in weights:
            d, rem = divmod(rem, w)
            digits.append(d)
        expected = [digits[0]]
        for d in digits[1:]:
            expected.append(d + (d >= expected[-1]))
        np.testing.assert_array_equal(got[offset], expected)


def test_iterators() -> None:
    it = generate_all_path_candidates_iter(4, 2)
    assert len(it) == count_path_candidates(4, 2)
    rows = list(it)
    assert len(rows) == 12
    chunks_it = generate_all_path_candidates_chunks_iter(4, 2, chunk_size=5)
    assert len(chunks_it) == 3
    combined = jnp.concatenate(list(chunks_it), axis=0)
    np.testing.assert_array_equal(
        np.asarray(combined), np.asarray(generate_all_path_candidates(4, 2))
    )
