"""Train ilql on guess_city — wrapper over the unified CLI."""
import sys

from lmrl_gym_tpu.cli.train import main

if __name__ == "__main__":
    main(["--task", "guess_city", "--algo", "ilql"] + sys.argv[1:])
