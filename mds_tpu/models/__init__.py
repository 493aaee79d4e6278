"""Flax model zoo + factory.

Reference: lib/models/__init__.py `model_factory` (17 entries). Models are
registered into mds_tpu.registry.MODELS; `model_factory[name]` works the same.
"""

from mds_tpu.registry import MODELS as model_factory  # noqa: F401

# import modules for registration side effects
from mds_tpu.models import bisenetv1  # noqa: F401,E402
from mds_tpu.models import bisenetv2  # noqa: F401,E402
from mds_tpu.models import swiftnet  # noqa: F401,E402
from mds_tpu.models import semseg  # noqa: F401,E402
from mds_tpu.models import hrnet  # noqa: F401,E402
from mds_tpu.models import gnn  # noqa: F401,E402
from mds_tpu.models import swin  # noqa: F401,E402
from mds_tpu.models import bisenetv2_contrast  # noqa: F401,E402
