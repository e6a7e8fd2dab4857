"""HAA-LSTM entry point (the reference's ``xview_lstm/main.py``)."""

import sys

from avdn_tpu.cli.main import main as _main


def main():
    _main(sys.argv[1:], family="lstm")


if __name__ == "__main__":
    main()
