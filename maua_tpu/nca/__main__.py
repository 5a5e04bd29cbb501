"""`python -m maua_tpu.nca` entry (`maua/nca/__main__.py` role)."""

from .nca import main

if __name__ == "__main__":
    main()
