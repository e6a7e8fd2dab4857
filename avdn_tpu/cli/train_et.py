"""HAA-Transformer entry point (the reference's ``xview_et/main.py``)."""

import sys

from avdn_tpu.cli.main import main as _main


def main():
    _main(sys.argv[1:], family="et")


if __name__ == "__main__":
    main()
