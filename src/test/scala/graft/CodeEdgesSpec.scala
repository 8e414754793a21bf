package graft

import graft.operators.CodeEdges

class CodeEdgesSpec extends SparkSpec {
  import spark.implicits._

  private def edgesOf(lang: String, content: String): Set[(String, String, String, String)] =
    CodeEdges.edges(Seq(("f", lang, content)).toDF("path", "language", "content"))
      .as[(String, String, String, String)].collect().toSet

  test("python imports, from-imports, defs, inheritance") {
    val e = edgesOf("python",
      """import os.path
        |from ..pkg import helper
        |def run():
        |    pass
        |class Worker(Base):
        |    pass""".stripMargin)
    assert(e.contains(("f", "os.path", "IMPORTS", "import")))
    assert(e.contains(("f", "..pkg", "IMPORTS", "from_import")))
    assert(e.contains(("f", "run", "DEFINES", "function")))
    assert(e.contains(("f", "Worker", "DEFINES", "class")))
    assert(e.contains(("Worker", "Base", "INHERITS", "class")))
  }

  test("javascript es6 variants, require, class extends") {
    val e = edgesOf("javascript",
      """import React from 'react'
        |import { a, b } from './util'
        |import * as ns from 'lib'
        |import 'side-effect'
        |const fs = require('fs')
        |function go() {}
        |class Btn extends React.Component {}""".stripMargin)
    assert(e.contains(("f", "react", "IMPORTS", "es6_import")))
    assert(e.contains(("f", "./util", "IMPORTS", "es6_import")))
    assert(e.contains(("f", "lib", "IMPORTS", "es6_import")))
    assert(e.contains(("f", "side-effect", "IMPORTS", "es6_import")))
    assert(e.contains(("f", "fs", "IMPORTS", "commonjs_require")))
    assert(e.contains(("f", "go", "DEFINES", "function")))
    assert(e.contains(("Btn", "React.Component", "INHERITS", "class")))
  }

  test("java plain + static + wildcard imports do not cross-match") {
    val e = edgesOf("java",
      """import java.util.List;
        |import java.util.*;
        |import static org.junit.Assert.assertEquals;
        |public class T extends Base {}""".stripMargin)
    assert(e.contains(("f", "java.util.List", "IMPORTS", "import")))
    assert(e.contains(("f", "java.util.*", "IMPORTS", "import")))
    assert(e.contains(("f", "org.junit.Assert.assertEquals", "IMPORTS", "static_import")))
    // the static line must NOT also match the plain-import rule
    assert(!e.exists(t => t._4 == "import" && t._2.contains("assertEquals")))
    assert(e.contains(("T", "Base", "INHERITS", "class")))
  }

  test("go single-line and parenthesized block imports") {
    val e = edgesOf("go",
      """package main
        |
        |import "fmt"
        |
        |import (
        |    "os"
        |    "net/http"
        |)
        |
        |func Serve() {}""".stripMargin)
    assert(e.contains(("f", "fmt", "IMPORTS", "import")))
    assert(e.contains(("f", "os", "IMPORTS", "block_import")))
    assert(e.contains(("f", "net/http", "IMPORTS", "block_import")))
    assert(e.contains(("f", "Serve", "DEFINES", "function")))
  }

  test("php use / require variants, function, class extends") {
    val e = edgesOf("php",
      """<?php
        |use App\Models\User;
        |use function App\Helpers\format as fmt;
        |require_once 'bootstrap.php';
        |include("legacy.php");
        |function handle() {}
        |class Ctrl extends BaseCtrl {}""".stripMargin)
    assert(e.contains(("f", """App\Models\User""", "IMPORTS", "use")))
    assert(e.contains(("f", """App\Helpers\format""", "IMPORTS", "use")))
    assert(e.contains(("f", "bootstrap.php", "IMPORTS", "require")))
    assert(e.contains(("f", "legacy.php", "IMPORTS", "require")))
    assert(e.contains(("f", "handle", "DEFINES", "function")))
    assert(e.contains(("f", "Ctrl", "DEFINES", "class")))
    assert(e.contains(("Ctrl", "BaseCtrl", "INHERITS", "class")))
  }

  test("unknown language yields no edges") {
    assert(edgesOf("ruby", "require 'json'").isEmpty)
  }

  test("call edges attribute callees to the enclosing def only") {
    val calls = CodeEdges.callEdges(Seq(("f", "python",
      """import os
        |def alpha():
        |    helper(load(x))
        |    if (cond):
        |        return fmt(x)
        |top_level(call)
        |class K(Base):
        |    helper2(y)
        |    def beta(self):
        |        inner(z)""".stripMargin)).toDF("path", "language", "content"))
      .as[(String, String, String, String)].collect().map(t => (t._1, t._2)).toSet
    assert(calls.contains(("alpha", "helper")))
    assert(calls.contains(("alpha", "load")))
    assert(calls.contains(("alpha", "fmt")))        // keyword 'if'/'return' excluded
    assert(!calls.exists(_._2 == "if"))
    assert(!calls.exists(_._2 == "top_level"))      // module-level call: no scope
    assert(!calls.exists(_._2 == "K"))              // class line resets scope
    assert(calls.contains(("beta", "inner")))       // methods open scopes too
  }
}
