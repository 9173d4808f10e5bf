"""On-device path-candidate enumeration (TPU-native design).

The reference enumerates path candidates with a host-side Rust iterator
(differt-core/src/geometry/graph.rs:286-527), materializing
``N * (N-1)**(order-1)`` rows on the host and transferring them to device.

Here the same loop-free sequences (no two consecutive equal indices over
``N`` primitives) are generated *on device* from a closed-form
``index -> candidate`` decode: candidate ``i`` is a mixed-radix counter with
first digit in base ``N`` and subsequent digits in base ``N - 1``, where each
later digit ``c`` maps to the actual primitive ``c + (c >= previous)`` (the
skip-previous rule). This yields candidates in exactly the same
lexicographic order as the reference iterator (graph.rs:400-478), with zero
host work and zero host->device transfer — each chip can decode exactly its
own shard of the candidate space.

Arbitrarily large candidate spaces (beyond 2**31) are supported by decoding
the *chunk start* into counter digits with exact Python integers (static
arguments) and adding per-element offsets with vectorized carry propagation,
so no on-device integer ever exceeds ``chunk start digit + chunk size``.
"""

from collections.abc import Callable, Iterator, Sized
from functools import partial
from typing import TypeVar

import jax
import jax.numpy as jnp
from jaxtyping import Array, Int

_T = TypeVar("_T")


class SizedIterator(Iterator[_T], Sized):
    """An iterator that also knows its length (for, e.g., tqdm).

    Reference parity: ``differt.rt.SizedIterator`` (_utils.py:1004-1044).
    """

    __slots__ = ("_iter", "_size")

    def __init__(self, iter: Iterator[_T], size: int | Callable[[], int]) -> None:  # noqa: A002
        self._iter = iter
        self._size = size

    def __iter__(self) -> "SizedIterator[_T]":
        return self

    def __next__(self) -> _T:
        return next(self._iter)

    def __len__(self) -> int:
        return self._size if isinstance(self._size, int) else self._size()


def count_path_candidates(num_primitives: int, order: int) -> int:
    """Exact number of loop-free path candidates, as a Python integer.

    ``N * (N-1)**(order-1)`` for ``order >= 1``, 1 for ``order == 0``.
    Reference parity: graph.rs:313-377 / _utils.py:1069-1071.

    Examples:
        >>> from differt_tpu.geometry import count_path_candidates
        >>> count_path_candidates(10, 2)
        90
        >>> count_path_candidates(10, 0)
        1
    """
    if order < 0 or num_primitives <= 0:
        return 0
    if order == 0:
        return 1
    return num_primitives * (num_primitives - 1) ** (order - 1)


def _counter_digits(index: int, num_primitives: int, order: int) -> tuple[int, ...]:
    """Decode a flat candidate index into counter digits with exact host ints."""
    # First digit has base ``num_primitives``, the rest ``num_primitives - 1``.
    digits = []
    rem = index
    weights = [(num_primitives - 1) ** (order - 1 - t) for t in range(order)]
    for weight in weights:
        if weight == 0:  # Degenerate N == 1 cases (at most one candidate).
            digits.append(0)
        else:
            digit, rem = divmod(rem, weight)
            digits.append(digit)
    return tuple(digits)


@partial(jax.jit, static_argnames=("start", "size", "num_primitives", "order"))
def _decode_range(
    start: int,
    size: int,
    num_primitives: int,
    order: int,
) -> Int[Array, "size order"]:
    """Decode candidates ``start .. start+size`` fully on device."""
    dtype = jnp.int32
    if order == 0:
        return jnp.zeros((size, 0), dtype=dtype)

    base = num_primitives - 1
    start_digits = _counter_digits(start, num_primitives, order)

    j = jnp.arange(size, dtype=dtype)

    # Offset digits of j in the same mixed radix. Static powers let us skip
    # digits whose weight exceeds the chunk size entirely, so no on-device
    # value ever overflows int32.
    offset_digits: list[Array] = []
    rem = j
    for t in range(order):
        weight = base ** (order - 1 - t) if base > 0 else 1
        if weight > size or weight == 0:
            offset_digits.append(jnp.zeros_like(j))
        else:
            w = jnp.asarray(weight, dtype=dtype)
            offset_digits.append(rem // w)
            rem = rem % w
    # Add start digits + offset digits with carry, least significant first.
    counters: list[Array] = [None] * order  # type: ignore[list-item]
    carry = jnp.zeros_like(j)
    for t in reversed(range(order)):
        digit_base = num_primitives if t == 0 else base
        total = offset_digits[t] + start_digits[t] + carry
        counters[t] = total % digit_base
        carry = total // digit_base

    # Map counters to primitive indices with the skip-previous rule.
    out = [counters[0]]
    for t in range(1, order):
        prev = out[-1]
        c = counters[t]
        out.append(c + (c >= prev).astype(dtype))
    return jnp.stack(out, axis=-1)


def generate_path_candidates(
    num_primitives: int,
    order: int,
    *,
    start: int = 0,
    size: int | None = None,
) -> Int[Array, "size order"]:
    """Generate (a shard of) all loop-free path candidates on device.

    Args:
        num_primitives: Number of primitives ``N``.
        order: Number of interactions per path.
        start: Index of the first candidate to decode (supports Python
            big integers, enabling sharded / chunked decoding of candidate
            spaces far beyond 2**31).
        size: Number of candidates to decode. Defaults to all remaining.

    Returns:
        Primitive indices, one candidate per row, in the same order as the
        reference's exhaustive iterator.
    """
    total = count_path_candidates(num_primitives, order)
    if size is None:
        size = max(total - start, 0)
    return _decode_range(start, size, num_primitives, order)


def generate_all_path_candidates(
    num_primitives: int,
    order: int,
) -> Int[Array, "num_candidates order"]:
    """All path candidates at once. Reference parity: _utils.py:1047-1081.

    Examples:
        >>> from differt_tpu.geometry import generate_all_path_candidates
        >>> generate_all_path_candidates(3, 2).tolist()
        [[0, 1], [0, 2], [1, 0], [1, 2], [2, 0], [2, 1]]
    """
    return generate_path_candidates(num_primitives, order)


def generate_all_path_candidates_iter(
    num_primitives: int,
    order: int,
) -> SizedIterator[Int[Array, " order"]]:
    """Iterator over single candidates. Reference parity: _utils.py:1084-1105."""
    total = count_path_candidates(num_primitives, order)

    def gen() -> Iterator[Int[Array, " order"]]:
        chunk_size = 4096
        for start in range(0, total, chunk_size):
            chunk = generate_path_candidates(
                num_primitives, order, start=start, size=min(chunk_size, total - start)
            )
            yield from chunk

    return SizedIterator(gen(), size=total)


def generate_all_path_candidates_chunks_iter(
    num_primitives: int,
    order: int,
    chunk_size: int = 1000,
) -> SizedIterator[Int[Array, "chunk_size order"]]:
    """Chunked candidate iterator. Reference parity: _utils.py:1108-1132.

    Unlike the reference (host-side Rust iterator feeding device copies),
    every chunk here is decoded directly on device.
    """
    total = count_path_candidates(num_primitives, order)
    num_chunks = -(-total // chunk_size) if total else 0

    def gen() -> Iterator[Int[Array, "chunk_size order"]]:
        for start in range(0, total, chunk_size):
            yield generate_path_candidates(
                num_primitives, order, start=start, size=min(chunk_size, total - start)
            )

    return SizedIterator(gen(), size=num_chunks)


def generate_filtered_path_candidates(
    num_primitives: int,
    order: int,
    predicate,
    *,
    chunk_size: int = 1 << 20,
    warn_above: int = 1 << 30,
):
    """All candidates satisfying ``predicate``, without materializing the space.

    Decodes the ``N * (N-1)**(order-1)`` candidate space ``chunk_size``
    indices at a time (closed-form, on device), applies
    ``predicate(chunk) -> bool[size]``, and concatenates the survivors on
    the host — O(chunk + num_kept) memory instead of O(num_total). This is
    the pure-JAX fallback matching the native filtered DFS
    (native/_native.cpp) and the reference's chunked Rust iterator
    (graph.rs:77-116); order-3 on a 10k-primitive mesh (10^12 candidates)
    streams instead of OOM-ing.

    Emits a warning when the unpruned space exceeds ``warn_above`` —
    at ~10^8 candidates/s of decode+filter such an enumeration takes
    minutes; prefer the native DFS or stronger visibility masks.
    """
    import warnings

    import numpy as np

    total = count_path_candidates(num_primitives, order)
    if total > warn_above:
        warnings.warn(
            f"Filtering {total:.3g} path candidates by exhaustive chunked "
            "enumeration; this may take minutes. Build the native extension "
            "(differt_tpu.native) for a filtered DFS that never visits "
            "pruned branches, or reduce the candidate space with masks.",
            stacklevel=2,
        )
    parts = []
    for start in range(0, total, chunk_size):
        size = min(chunk_size, total - start)
        chunk = generate_path_candidates(
            num_primitives, order, start=start, size=size
        )
        keep = np.asarray(predicate(chunk))
        parts.append(np.asarray(chunk)[keep])
    if not parts:
        import jax.numpy as jnp

        return jnp.zeros((0, max(order, 0)), dtype=jnp.int32)
    import jax.numpy as jnp

    return jnp.asarray(np.concatenate(parts, axis=0))
