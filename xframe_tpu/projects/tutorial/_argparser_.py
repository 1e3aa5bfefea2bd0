"""CLI help texts for the tutorial project."""

PROJECT_DESCRIPTION = "Minimal example project (framework walkthrough)."

WORKER_HELP = {
    "get_started": ("minimal example worker",
                    "Runs the minimal example ProjectWorker: demonstrates "
                    "settings access and database saving."),
}
