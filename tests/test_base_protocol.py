"""Every exponential-family module satisfies the L0 protocol."""

from svax.expfam import base, dirichlet, mvn, niw


def test_families_implement_protocol():
    assert base.implements(dirichlet)
    assert base.implements(niw)
    assert base.implements(mvn)


def test_non_family_module_rejected():
    from svax import data

    assert not base.implements(data)
