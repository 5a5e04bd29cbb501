"""`python -m maua_tpu` entry (`maua/__main__.py:6-8`)."""

from .cli.entrypoint import main

if __name__ == "__main__":
    main()
