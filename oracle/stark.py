"""MiMC STARK prover and verifier (per-AIR orchestration).

Spec: SURVEY.md §4.1/§4.2 (`starks/stark.py :: mk_mimc_proof /
verify_mimc_proof`) and §A. Pipeline: trace -> iNTT at G1 -> NTT at G2
(8x LDE) -> transition constraint -> quotient D = C/Z -> boundary B ->
Merkle commit of P||D||B -> Fiat-Shamir degree-adjusted random linear
combination L -> commit -> 80 spot checks -> FRI proof on L.
"""

from .field import PrimeField
from .fft import fft
from .merkle import merkelize, mk_multi_branch, verify_multi_branch
from .fri import prove_low_degree, verify_low_degree_proof
from .utils import blake, get_power_cycle, get_pseudorandom_indices, is_a_power_of_2

MODULUS = 2**256 - 351 * 2**32 + 1
EXTENSION_FACTOR = 8           # LDE blowup (SURVEY §A.2)
SPOT_CHECK_SECURITY_FACTOR = 80  # STARK spot checks (SURVEY §A.6)
GENERATOR = 7                  # multiplicative generator of F_p* (SURVEY §A.1)

f = PrimeField(MODULUS)


def mk_mimc_proof(inp, steps, round_constants):
    """Generate a STARK proof that mimc(inp, steps, round_constants) = output.

    Returns [m_root, l_root, main_branches, linear_comb_branches, fri_proof]
    (SURVEY §A.8).
    """
    assert steps <= 2**32 // EXTENSION_FACTOR
    assert is_a_power_of_2(steps) and is_a_power_of_2(len(round_constants))
    assert len(round_constants) < steps

    precision = steps * EXTENSION_FACTOR
    G2 = f.exp(GENERATOR, (MODULUS - 1) // precision)  # evaluation domain gen
    skips = precision // steps                          # = EXTENSION_FACTOR
    G1 = f.exp(G2, skips)                               # trace domain gen

    # 1. Trace: sequential MiMC rounds.
    computational_trace = [inp]
    for i in range(steps - 1):
        computational_trace.append(
            (computational_trace[-1] ** 3
             + round_constants[i % len(round_constants)]) % MODULUS)
    output = computational_trace[-1]

    # 2-3. Interpolate the trace over <G1>, extend over <G2> (8x blowup).
    computational_trace_polynomial = fft(computational_trace, MODULUS, G1, inv=True)
    p_evaluations = fft(computational_trace_polynomial, MODULUS, G2)

    # 4. Round-constant mini-polynomial, extended to the evaluation domain
    #    (read cyclically: K(x) repeats every precision//skips2 points).
    skips2 = steps // len(round_constants)
    constants_mini_polynomial = fft(round_constants, MODULUS,
                                    f.exp(G1, skips2), inv=True)
    constants_mini_extension = fft(constants_mini_polynomial, MODULUS,
                                   f.exp(G2, skips2))

    # 5. Transition constraint C(x) = P(g1*x) - P(x)^3 - K(x) on the LDE
    #    domain; index shift by `skips` realizes x -> g1*x.
    c_of_p_evaluations = [
        (p_evaluations[(i + skips) % precision]
         - p_evaluations[i] ** 3
         - constants_mini_extension[i % len(constants_mini_extension)])
        % MODULUS
        for i in range(precision)]

    # 6. Quotient D = C / Z, Z(x) = (x^steps - 1)/(x - last_step_position).
    xs = get_power_cycle(G2, MODULUS)
    last_step_position = xs[(steps - 1) * skips]
    z_num_evaluations = [(xs[(i * steps) % precision] - 1) % MODULUS
                         for i in range(precision)]
    z_num_inv = f.multi_inv(z_num_evaluations)
    z_den_evaluations = [(xs[i] - last_step_position) % MODULUS
                         for i in range(precision)]
    d_evaluations = [cp * zd * zni % MODULUS for cp, zd, zni in
                     zip(c_of_p_evaluations, z_den_evaluations, z_num_inv)]

    # 7. Boundary polynomial B = (P - I) / ((x - 1)(x - last_step_position)).
    interpolant = f.lagrange_interp_2([1, last_step_position], [inp, output])
    i_evaluations = [f.eval_poly_at(interpolant, x) for x in xs]
    zeropoly2 = f.mul_polys([-1, 1], [-last_step_position, 1])
    inv_z2_evaluations = f.multi_inv([f.eval_poly_at(zeropoly2, x) for x in xs])
    b_evaluations = [((p - i) * invq) % MODULUS for p, i, invq in
                     zip(p_evaluations, i_evaluations, inv_z2_evaluations)]

    # 8. Commit #1: composite 96-byte leaves P||D||B (SURVEY §A.4).
    mtree = merkelize([
        pval.to_bytes(32, 'big') + dval.to_bytes(32, 'big') + bval.to_bytes(32, 'big')
        for pval, dval, bval in zip(p_evaluations, d_evaluations, b_evaluations)])

    # 9. Fiat-Shamir degree-adjusted random linear combination
    #    L = D + k1*P + k2*P*x^steps + k3*B + k4*B*x^steps (SURVEY §A.5/7).
    k1 = int.from_bytes(blake(mtree[1] + b'\x01'), 'big')
    k2 = int.from_bytes(blake(mtree[1] + b'\x02'), 'big')
    k3 = int.from_bytes(blake(mtree[1] + b'\x03'), 'big')
    k4 = int.from_bytes(blake(mtree[1] + b'\x04'), 'big')
    G2_to_the_steps = f.exp(G2, steps)
    powers = [1]
    for i in range(1, precision):
        powers.append(powers[-1] * G2_to_the_steps % MODULUS)
    l_evaluations = [
        (d_evaluations[i]
         + k1 * p_evaluations[i] + k2 * p_evaluations[i] * powers[i]
         + k3 * b_evaluations[i] + k4 * b_evaluations[i] * powers[i])
        % MODULUS
        for i in range(precision)]

    # 10. Commit #2.
    l_mtree = merkelize(l_evaluations)

    # 11. Spot checks: 80 positions excluding trace-domain points
    #     (multiples of `skips`), each augmented with x -> g1*x partner.
    positions = get_pseudorandom_indices(
        l_mtree[1], precision, SPOT_CHECK_SECURITY_FACTOR,
        exclude_multiples_of=EXTENSION_FACTOR)
    augmented_positions = sum([[x, (x + skips) % precision] for x in positions], [])

    # 12. FRI proof that deg(L) < 2*steps.
    fri_proof = prove_low_degree(l_evaluations, G2, steps * 2, MODULUS,
                                 exclude_multiples_of=EXTENSION_FACTOR)

    return [mtree[1],
            l_mtree[1],
            mk_multi_branch(mtree, augmented_positions),
            mk_multi_branch(l_mtree, positions),
            fri_proof]


def verify_mimc_proof(inp, steps, round_constants, output, proof):
    """O(polylog) verifier: FRI verify + 80 per-position consistency checks
    (transition, boundary, linear combination). Spec: SURVEY §4.2."""
    m_root, l_root, main_branches, linear_comb_branches, fri_proof = proof
    assert steps <= 2**32 // EXTENSION_FACTOR
    assert is_a_power_of_2(steps) and is_a_power_of_2(len(round_constants))
    assert len(round_constants) < steps

    precision = steps * EXTENSION_FACTOR
    G2 = f.exp(GENERATOR, (MODULUS - 1) // precision)
    skips = precision // steps
    skips2 = steps // len(round_constants)

    # K(x) is evaluated directly from the mini-polynomial (degree = #constants).
    constants_mini_polynomial = fft(round_constants, MODULUS,
                                    f.exp(G2, EXTENSION_FACTOR * skips2), inv=True)

    assert verify_low_degree_proof(l_root, G2, fri_proof, steps * 2, MODULUS,
                                   exclude_multiples_of=EXTENSION_FACTOR)

    # Transcript replay.
    k1 = int.from_bytes(blake(m_root + b'\x01'), 'big')
    k2 = int.from_bytes(blake(m_root + b'\x02'), 'big')
    k3 = int.from_bytes(blake(m_root + b'\x03'), 'big')
    k4 = int.from_bytes(blake(m_root + b'\x04'), 'big')
    positions = get_pseudorandom_indices(
        l_root, precision, SPOT_CHECK_SECURITY_FACTOR,
        exclude_multiples_of=EXTENSION_FACTOR)
    augmented_positions = sum([[x, (x + skips) % precision] for x in positions], [])
    last_step_position = f.exp(G2, (steps - 1) * skips)

    main_branch_leaves = verify_multi_branch(m_root, augmented_positions,
                                             main_branches)
    linear_comb_branch_leaves = verify_multi_branch(l_root, positions,
                                                    linear_comb_branches)

    interpolant = f.lagrange_interp_2([1, last_step_position], [inp, output])
    zeropoly2 = f.mul_polys([-1, 1], [-last_step_position, 1])

    for i, pos in enumerate(positions):
        x = f.exp(G2, pos)
        x_to_the_steps = f.exp(x, steps)
        mbranch1 = main_branch_leaves[i * 2]       # leaf at x
        mbranch2 = main_branch_leaves[i * 2 + 1]   # leaf at g1*x
        l_of_x = int.from_bytes(linear_comb_branch_leaves[i], 'big')
        p_of_x = int.from_bytes(mbranch1[:32], 'big')
        p_of_g1x = int.from_bytes(mbranch2[:32], 'big')
        d_of_x = int.from_bytes(mbranch1[32:64], 'big')
        b_of_x = int.from_bytes(mbranch1[64:], 'big')

        zvalue = f.div(f.exp(x, steps) - 1, x - last_step_position)
        k_of_x = f.eval_poly_at(constants_mini_polynomial, f.exp(x, skips2))

        # Transition: Q(x) = P(g1*x) - P(x)^3 - K(x) = Z(x) * D(x).
        assert (p_of_g1x - p_of_x ** 3 - k_of_x - zvalue * d_of_x) % MODULUS == 0
        # Boundary: P(x) = B(x) * (x-1)(x-last) + I(x).
        assert (p_of_x - b_of_x * f.eval_poly_at(zeropoly2, x)
                - f.eval_poly_at(interpolant, x)) % MODULUS == 0
        # Linear combination consistency.
        assert (l_of_x - d_of_x
                - k1 * p_of_x - k2 * p_of_x * x_to_the_steps
                - k3 * b_of_x - k4 * b_of_x * x_to_the_steps) % MODULUS == 0

    return True
