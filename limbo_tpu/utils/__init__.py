from limbo_tpu.utils import random
from limbo_tpu.utils.maths import safe_sqrt, sq_dist, masked_identity_gram
