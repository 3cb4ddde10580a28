"""Deterministic ratings fixture generator (FIXTURES.md §1).

The reference ships a spreadsheet-generated CSV with planted 2-block
structure: odd users rate products 1-3 high / 4-6 low, even users the
reverse, with sparse ±1 noise; 120 rows = 111 train + 9 validation
(data/csv/readme.txt:2-11, data/csv/ratings.csv). The spreadsheet's
randomness is unseeded; this generator is seeded (seed=42 convention)
so every test run sees identical bytes.

Each row has the reference's 11 positional fields; fields 4-10 are
scaffolding strings the parser must ignore.
"""

from __future__ import annotations

import random

N_USERS = 20
N_PRODUCTS = 6


def _base_rating(user: int, product: int) -> int:
    # odd users favor products 1-3; even users favor 4-6
    high_half = product <= N_PRODUCTS // 2
    odd = user % 2 == 1
    return 5 if (odd == high_half) else 1


def generate_ratings_rows(seed: int = 42, noise_rate: float = 0.13) -> list[str]:
    """Full 20x6 grid; ~9 validation cells sampled so every validation
    (user, product) also appears for other users/products in training —
    no cold-start drops (FIXTURES.md §1 planted-structure contract)."""
    rng = random.Random(seed)
    cells = [(u, p) for u in range(1, N_USERS + 1) for p in range(1, N_PRODUCTS + 1)]
    validation_cells = set(rng.sample(cells, 9))
    rows = []
    for user, product in cells:
        base = _base_rating(user, product)
        noisy = rng.random() < noise_rate
        # noise pulls high ratings down to 4 and low ratings up to 2
        rating = (base - 1 if base == 5 else base + 1) if noisy else base
        tag = "V" if (user, product) in validation_cells else "I"
        scaffold = f"{base},{user % 2},{int(noisy)},+,1,,"
        rows.append(f"{tag},{user},{product},{rating},{scaffold}")
    return rows


def write_ratings_csv(path: str, seed: int = 42) -> str:
    with open(path, "w") as f:
        f.write("\n".join(generate_ratings_rows(seed)) + "\n")
    return path
