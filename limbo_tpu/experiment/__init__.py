from limbo_tpu.experiment.launcher import (
    generate_job_scripts,
    load_conf,
    run_local,
)
from limbo_tpu.experiment.scaffold import create_exp
