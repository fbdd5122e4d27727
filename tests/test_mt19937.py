from famsa_tpu.utils.mt19937 import MT19937


def test_mt19937_known_vector():
    # C++ standard: the 10000th consecutive invocation of a default-
    # constructed std::mt19937 produces 4123659995.
    g = MT19937(5489)
    for _ in range(9999):
        g()
    assert g() == 4123659995


def test_mt19937_seeded():
    g = MT19937(0)
    v = [g() for _ in range(3)]
    assert v[0] == 2357136044  # classic init_genrand(0) first output
