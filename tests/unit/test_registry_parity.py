"""SURVEY §2.6 X2: processor registry names match the reference's
``logprep/registry.py`` exactly."""

import os
import re

import pytest

from logprep_spark.operators import PROCESSORS

REF_REGISTRY = "/root/reference/logprep/registry.py"


@pytest.mark.skipif(not os.path.exists(REF_REGISTRY), reason="reference not present")
def test_processor_names_match_reference():
    with open(REF_REGISTRY) as fh:
        src = fh.read()
    ref_names = set(
        re.findall(r'"(\w+)": "logprep\.processor\.[\w.]+"', src)
    )
    assert ref_names == set(PROCESSORS)
