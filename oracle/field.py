"""Scalar prime-field + polynomial helpers on Python bigints.

Spec: SURVEY.md §3.1 "Prime field (procedural, hot path)"
(`starks/poly_utils.py :: PrimeField [~1-170]`). This is the oracle's
bigint cost model: O(n^2) schoolbook polynomial ops, batch inversion via
the Montgomery product-tree trick, hand-unrolled 2-/4-point Lagrange
interpolation shared across groups via one `multi_inv`.
"""


class PrimeField:
    def __init__(self, modulus: int):
        self.modulus = modulus

    # ---- scalar ops -------------------------------------------------

    def add(self, x, y):
        return (x + y) % self.modulus

    def sub(self, x, y):
        return (x - y) % self.modulus

    def mul(self, x, y):
        return (x * y) % self.modulus

    def exp(self, x, p):
        return pow(x, p, self.modulus)

    def inv(self, a):
        """Modular inverse; inv(0) = 0 (SURVEY §3.1: reference convention)."""
        if a == 0:
            return 0
        return pow(a, self.modulus - 2, self.modulus)

    def div(self, x, y):
        return (x * self.inv(y)) % self.modulus

    def multi_inv(self, values):
        """Batch inversion: one inv + 3(n-1) muls; zeros map to zero.

        Spec: SURVEY §3.1 (`multi_inv`, Montgomery batch-inversion trick).
        """
        partials = [1]
        for v in values:
            partials.append(partials[-1] * (v or 1) % self.modulus)
        inv = self.inv(partials[-1])
        outputs = [0] * len(values)
        for i in range(len(values) - 1, -1, -1):
            outputs[i] = partials[i] * inv % self.modulus if values[i] else 0
            inv = inv * (values[i] or 1) % self.modulus
        return outputs

    # ---- dense coefficient-list polynomials -------------------------

    def eval_poly_at(self, p, x):
        """Horner evaluation of coefficient list p (p[0] = constant term)."""
        y = 0
        power_of_x = 1
        for coeff in p:
            y += power_of_x * coeff
            power_of_x = power_of_x * x % self.modulus
        return y % self.modulus

    def add_polys(self, a, b):
        return [((a[i] if i < len(a) else 0) + (b[i] if i < len(b) else 0))
                % self.modulus for i in range(max(len(a), len(b)))]

    def sub_polys(self, a, b):
        return [((a[i] if i < len(a) else 0) - (b[i] if i < len(b) else 0))
                % self.modulus for i in range(max(len(a), len(b)))]

    def mul_by_const(self, a, c):
        return [x * c % self.modulus for x in a]

    def mul_polys(self, a, b):
        o = [0] * (len(a) + len(b) - 1)
        for i, aval in enumerate(a):
            for j, bval in enumerate(b):
                o[i + j] += aval * bval
        return [x % self.modulus for x in o]

    def div_polys(self, a, b):
        """Long division a / b (exact or truncating), b non-degenerate."""
        assert len(a) >= len(b)
        a = [x for x in a]
        o = []
        apos = len(a) - 1
        bpos = len(b) - 1
        diff = apos - bpos
        binv = self.inv(b[bpos])
        while diff >= 0:
            quot = a[apos] * binv % self.modulus
            o.insert(0, quot)
            for i in range(bpos, -1, -1):
                a[diff + i] -= b[i] * quot
            apos -= 1
            diff -= 1
        return [x % self.modulus for x in o]

    def zpoly(self, xs):
        """Vanishing polynomial prod(x - x_i)."""
        root = [1]
        for x in xs:
            root.insert(0, 0)
            for j in range(len(root) - 1):
                root[j] -= root[j + 1] * x
        return [x % self.modulus for x in root]

    def lagrange_interp(self, xs, ys):
        """O(n^2) Lagrange interpolation through (xs, ys)."""
        root = self.zpoly(xs)
        assert len(root) == len(ys) + 1
        nums = [self.div_polys(root, [-x, 1]) for x in xs]
        denoms = [self.eval_poly_at(nums[i], xs[i]) for i in range(len(xs))]
        invdenoms = self.multi_inv(denoms)
        b = [0] * len(ys)
        for i in range(len(xs)):
            yslice = ys[i] * invdenoms[i] % self.modulus
            for j in range(len(ys)):
                if nums[i][j] and ys[i]:
                    b[j] += nums[i][j] * yslice
        return [x % self.modulus for x in b]

    # ---- unrolled small interpolation (the FRI hot path) ------------

    def lagrange_interp_2(self, xs, ys):
        m = self.modulus
        eq0 = [-xs[1] % m, 1]
        eq1 = [-xs[0] % m, 1]
        e0 = self.eval_poly_at(eq0, xs[0])
        e1 = self.eval_poly_at(eq1, xs[1])
        invall = self.inv(e0 * e1)
        inv_y0 = ys[0] * invall * e1
        inv_y1 = ys[1] * invall * e0
        return [(eq0[i] * inv_y0 + eq1[i] * inv_y1) % m for i in range(2)]

    def lagrange_interp_4(self, xs, ys):
        m = self.modulus
        x01, x02, x03, x12, x13, x23 = (
            xs[0] * xs[1], xs[0] * xs[2], xs[0] * xs[3],
            xs[1] * xs[2], xs[1] * xs[3], xs[2] * xs[3],
        )
        eq0 = [-x12 * xs[3] % m, (x12 + x13 + x23), -xs[1] - xs[2] - xs[3], 1]
        eq1 = [-x02 * xs[3] % m, (x02 + x03 + x23), -xs[0] - xs[2] - xs[3], 1]
        eq2 = [-x01 * xs[3] % m, (x01 + x03 + x13), -xs[0] - xs[1] - xs[3], 1]
        eq3 = [-x01 * xs[2] % m, (x01 + x02 + x12), -xs[0] - xs[1] - xs[2], 1]
        e0 = self.eval_poly_at(eq0, xs[0])
        e1 = self.eval_poly_at(eq1, xs[1])
        e2 = self.eval_poly_at(eq2, xs[2])
        e3 = self.eval_poly_at(eq3, xs[3])
        e01 = e0 * e1
        e23 = e2 * e3
        invall = self.inv(e01 * e23)
        inv_y0 = ys[0] * invall * e1 * e23 % m
        inv_y1 = ys[1] * invall * e0 * e23 % m
        inv_y2 = ys[2] * invall * e01 * e3 % m
        inv_y3 = ys[3] * invall * e01 * e2 % m
        return [(eq0[i] * inv_y0 + eq1[i] * inv_y1 + eq2[i] * inv_y2
                 + eq3[i] * inv_y3) % m for i in range(4)]

    def multi_interp_4(self, xsets, ysets):
        """Batched 4-point interpolation sharing ONE multi_inv across all
        groups (SURVEY §3.1 `multi_interp_4` — the reference's key FRI
        optimization)."""
        m = self.modulus
        data = []
        invtargets = []
        for xs, ys in zip(xsets, ysets):
            x01, x02, x03, x12, x13, x23 = (
                xs[0] * xs[1], xs[0] * xs[2], xs[0] * xs[3],
                xs[1] * xs[2], xs[1] * xs[3], xs[2] * xs[3],
            )
            eq0 = [-x12 * xs[3] % m, (x12 + x13 + x23), -xs[1] - xs[2] - xs[3], 1]
            eq1 = [-x02 * xs[3] % m, (x02 + x03 + x23), -xs[0] - xs[2] - xs[3], 1]
            eq2 = [-x01 * xs[3] % m, (x01 + x03 + x13), -xs[0] - xs[1] - xs[3], 1]
            eq3 = [-x01 * xs[2] % m, (x01 + x02 + x12), -xs[0] - xs[1] - xs[2], 1]
            e0 = self.eval_poly_at(eq0, xs[0])
            e1 = self.eval_poly_at(eq1, xs[1])
            e2 = self.eval_poly_at(eq2, xs[2])
            e3 = self.eval_poly_at(eq3, xs[3])
            data.append([ys, eq0, eq1, eq2, eq3])
            invtargets.extend([e0, e1, e2, e3])
        invalls = self.multi_inv(invtargets)
        o = []
        for (i, (ys, eq0, eq1, eq2, eq3)) in enumerate(data):
            invallz = invalls[i * 4: i * 4 + 4]
            inv_y0 = ys[0] * invallz[0] % m
            inv_y1 = ys[1] * invallz[1] % m
            inv_y2 = ys[2] * invallz[2] % m
            inv_y3 = ys[3] * invallz[3] % m
            o.append([(eq0[i] * inv_y0 + eq1[i] * inv_y1 + eq2[i] * inv_y2
                       + eq3[i] * inv_y3) % m for i in range(4)])
        return o

    def eval_quartic(self, p, x):
        """Unrolled Horner for degree-3 coefficient lists."""
        xsq = x * x % self.modulus
        xcb = xsq * x
        return (p[0] + p[1] * x + p[2] * xsq + p[3] * xcb) % self.modulus
