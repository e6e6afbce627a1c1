"""Train ilql on twenty_questions — wrapper over the unified CLI."""
import sys

from lmrl_gym_tpu.cli.train import main

if __name__ == "__main__":
    main(["--task", "twenty_questions", "--algo", "ilql"] + sys.argv[1:])
