"""FRI low-degree proximity proofs: fold-by-4, 40 queries/round, base-case
cutoff maxdeg_plus_1 <= 16.

Spec: SURVEY.md §4.3 / §A.6 (`starks/fri.py [~1-160]`). Per round: commit
to the values, derive the column point from the root (Fiat-Shamir), group
the domain into N/4 cosets of 4 points at stride N/4, interpolate a
quartic through each group (one shared batch inversion), evaluate at the
column point -> N/4-length column, commit, answer 40 pseudorandom queries
with 1 column branch + 4 row branches each, recurse on (column, w^4,
maxdeg/4).
"""

from .field import PrimeField
from .merkle import merkelize, mk_branch, verify_branch
from .utils import get_power_cycle, get_pseudorandom_indices

FRI_QUERIES_PER_ROUND = 40
FRI_FOLD_ARITY = 4
FRI_BASE_CUTOFF = 16


def prove_low_degree(values, root_of_unity, maxdeg_plus_1, modulus,
                     exclude_multiples_of=0):
    f = PrimeField(modulus)

    # Base case: send all values; degree checked directly by the verifier.
    if maxdeg_plus_1 <= FRI_BASE_CUTOFF:
        return [[x.to_bytes(32, 'big') for x in values]]

    xs = get_power_cycle(root_of_unity, modulus)
    assert len(values) == len(xs)
    m = merkelize(values)

    # Fold-by-4: quartic through each stride-N/4 coset, evaluated at the
    # Fiat-Shamir point derived from the commitment root.
    quarter_len = len(xs) // 4
    x_polys = f.multi_interp_4(
        [[xs[i + quarter_len * j] for j in range(4)] for i in range(quarter_len)],
        [[values[i + quarter_len * j] for j in range(4)] for i in range(quarter_len)],
    )
    special_x = int.from_bytes(m[1], 'big') % modulus
    column = [f.eval_quartic(p, special_x) for p in x_polys]
    m2 = merkelize(column)

    ys = get_pseudorandom_indices(m2[1], len(column), FRI_QUERIES_PER_ROUND,
                                  exclude_multiples_of=exclude_multiples_of)
    branches = []
    for y in ys:
        branches.append([mk_branch(m2, y)]
                        + [mk_branch(m, y + quarter_len * j) for j in range(4)])

    return [[m2[1], branches]] + prove_low_degree(
        column, pow(root_of_unity, 4, modulus), maxdeg_plus_1 // 4, modulus,
        exclude_multiples_of=exclude_multiples_of)


def verify_low_degree_proof(merkle_root, root_of_unity, proof, maxdeg_plus_1,
                            modulus, exclude_multiples_of=0):
    f = PrimeField(modulus)

    # Domain size = multiplicative order of root_of_unity.
    roudeg = 1
    testval = root_of_unity
    while testval != 1:
        roudeg *= 2
        testval = testval * testval % modulus

    # x-coordinates of each coset differ by 4th roots of unity.
    quartic_roots_of_unity = [
        1,
        pow(root_of_unity, roudeg // 4, modulus),
        pow(root_of_unity, roudeg // 2, modulus),
        pow(root_of_unity, roudeg * 3 // 4, modulus),
    ]

    for prf in proof[:-1]:
        root2, branches = prf
        special_x = int.from_bytes(merkle_root, 'big') % modulus
        ys = get_pseudorandom_indices(root2, roudeg // 4, FRI_QUERIES_PER_ROUND,
                                      exclude_multiples_of=exclude_multiples_of)
        xcoords, rows, columnvals = [], [], []
        for i, y in enumerate(ys):
            x1 = pow(root_of_unity, y, modulus)
            xcoords.append([quartic_roots_of_unity[j] * x1 % modulus
                            for j in range(4)])
            rows.append([verify_branch(merkle_root, y + (roudeg // 4) * j,
                                       branches[i][j + 1], output_as_int=True)
                         for j in range(4)])
            columnvals.append(verify_branch(root2, y, branches[i][0],
                                            output_as_int=True))
        polys = f.multi_interp_4(xcoords, rows)
        for p, c in zip(polys, columnvals):
            assert f.eval_quartic(p, special_x) == c

        merkle_root = root2
        root_of_unity = pow(root_of_unity, 4, modulus)
        maxdeg_plus_1 //= 4
        roudeg //= 4

    # Final round: direct low-degree check on the sent values.
    data = [int.from_bytes(x, 'big') for x in proof[-1]]
    assert maxdeg_plus_1 <= FRI_BASE_CUTOFF
    mtree = merkelize(data)
    assert mtree[1] == merkle_root
    powers = get_power_cycle(root_of_unity, modulus)
    if exclude_multiples_of:
        pts = [x for x in range(len(data)) if x % exclude_multiples_of]
    else:
        pts = list(range(len(data)))
    poly = f.lagrange_interp([powers[x] for x in pts[:maxdeg_plus_1]],
                             [data[x] for x in pts[:maxdeg_plus_1]])
    for x in pts[maxdeg_plus_1:]:
        assert f.eval_poly_at(poly, powers[x]) == data[x]
    return True
