@echo off
REM Bring up the full stack via docker compose (Windows helper).
docker compose up --build
