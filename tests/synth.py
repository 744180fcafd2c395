"""Back-compat shim: the synthetic genome/BAM builders are shipped as
svision_tpu.sim (the training-set builder depends on them; tests/ is not
packaged)."""
from svision_tpu.sim import *          # noqa: F401,F403
from svision_tpu.sim import (make_genome, make_sv_bam, del_read, ins_read,  # noqa: F401
                             inv_read, tdup_read, dup_read, delins_read,
                             invdel_read)
