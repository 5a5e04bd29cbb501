"""Drive maua_tpu CLI surfaces on the CPU backend (for /verify when the
TPU relay is unavailable). Usage: python drive_cpu.py <subcommand> [args...]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

from maua_tpu.cli.entrypoint import main

sys.exit(main(sys.argv[1:]))
